"""Smith-Waterman conformance tests.

Golden cases ported from the reference test suite
(/root/reference/tests/smith_waterman_aligner_unit_tests.rs:228-402).
"""
import numpy as np
import pytest

from lorikeet_tpu.ops.smith_waterman import (
    ORIGINAL_DEFAULT, STANDARD_NGS, NEW_SW_PARAMETERS, SWParameters,
    OverhangStrategy, align, align_py,
)


def cigar_str(cigar):
    return "".join(f"{n}{op}" for op, n in cigar)


def check(ref, read, expected_start, expected_cigar, params, strategy):
    cigar, offset = align(ref.encode(), read.encode(), params, strategy)
    assert (offset, cigar_str(cigar)) == (expected_start, expected_cigar)


def test_read_alignment_to_ref_complex_alignment():
    check("AAAGGACTGACTG", "ACTGACTGACTG", 1, "12M",
          ORIGINAL_DEFAULT, OverhangStrategy.SOFTCLIP)


def test_odd_no_alignment():
    check("AAAGACTACTG", "AACGGACACTG", 1, "2M2I3M1D4M",
          SWParameters(50, -100, -220, -12), OverhangStrategy.SOFTCLIP)
    check("AAAGACTACTG", "AACGGACACTG", 0, "11M",
          SWParameters(200, -50, -300, -22), OverhangStrategy.SOFTCLIP)


def test_indels_at_start_and_end():
    check("AAACCCCC", "CCCCCGGG", 3, "5M3S",
          ORIGINAL_DEFAULT, OverhangStrategy.SOFTCLIP)


def test_degenerate_alignment_with_indels_at_both_ends():
    check("TGTGTGTGTGTGTGACAGAGAGAGAGAGAGAGAGAGAGAGAGAGA",
          "ACAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGA",
          14, "31M20S", STANDARD_NGS, OverhangStrategy.SOFTCLIP)


def test_substring_match():
    for strategy, start, cig in [
        (OverhangStrategy.SOFTCLIP, 3, "5M"),
        (OverhangStrategy.INDEL, 0, "3D5M"),
        (OverhangStrategy.LEADING_INDEL, 0, "3D5M"),
        (OverhangStrategy.IGNORE, 3, "5M"),
    ]:
        check("AAACCCCC", "CCCCC", start, cig, ORIGINAL_DEFAULT, strategy)


def test_identical_alignments_with_differing_flank_lengths():
    pad = "N" * 10
    padded_ref = pad + ("GCGTCGCAGTCTTAAGGCCCCGCCTTTTCAGACAGCTTCCGCTGGGCCTGGGCCGCTGC"
        "GGGGCGGTCACGGCCCCTTTAAGCCTGAGCCCCGCCCCCTGGCTCCCCGCCCCCTCTTCTCCCCTCCCCCAAGCC"
        "AGCACCTGGTGCCCCGGCGGGTCGTGCGGCGCGGCGCTCCGCGGTGAGCGCCTGACCCCGAGGGGGCCCGGGGCC"
        "GCGTCCCTGGGCCCTCCCCACCCTTGCGGTGGCCTCGCGGGTCCCAGGGGCGGGGCTGGAGCGGCAGCAGGGCCG"
        "GGGAGATGGGCGGTGGGGAGCGCGGGAGGGACCGGGCCGAGCCGGGGGAAGGGCTCCGGTGACT") + pad
    padded_hap = pad + ("GCGTCGCAGTCTTAAGGCCCCGCCTTTTCAGACAGCTTCCGCTGGGCCTGGGCCGCTGC"
        "GGGGCGGTCACGGCCCCTTTAAGCCTGAGCCCCGCCCCCTGGCTCCCCGCCCCCTCTTCTCCCCTCCCCCAAGCC"
        "AGCACCTGGTGCCCCGGCGGGTCGTGCGGCGCGGCGCTCCGCGGTGAGCGCCTGACCCCGAGGGCCGGGCCCTCC"
        "CCACCCTTGCGGTGGCCTCGCGGGTCCCAGGGGCGGGGCTGGAGCGGCAGCAGGGCCGGGGAGATGGGCGGTGGG"
        "GAGCGCGGGAGGGACCGGGCCGAGCCGGGGGAAGGGCTCCGGTGACT") + pad
    cigar, offset = align(padded_ref.encode(), padded_hap.encode(),
                          NEW_SW_PARAMETERS, OverhangStrategy.SOFTCLIP)
    # alignment must consume the whole read and account for the net deletion
    read_consumed = sum(n for op, n in cigar if op in "MIS")
    ref_consumed = sum(n for op, n in cigar if op in "MD")
    assert read_consumed == len(padded_hap)
    assert offset == 0
    net_del = sum(n for op, n in cigar if op == "D") - sum(
        n for op, n in cigar if op == "I")
    assert net_del == len(padded_ref) - len(padded_hap)
    assert ref_consumed == len(padded_ref)


def test_native_matches_python():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(25):
        L1 = int(rng.integers(10, 80))
        L2 = int(rng.integers(5, 80))
        ref = bases[rng.integers(0, 4, L1)]
        if rng.random() < 0.5 and L1 > L2:
            start = int(rng.integers(0, L1 - L2))
            read = ref[start:start + L2].copy()
            for _ in range(int(rng.integers(0, 3))):
                read[rng.integers(0, L2)] = bases[rng.integers(0, 4)]
        else:
            read = bases[rng.integers(0, 4, L2)]
        for strategy in (OverhangStrategy.SOFTCLIP, OverhangStrategy.INDEL,
                         OverhangStrategy.LEADING_INDEL, OverhangStrategy.IGNORE):
            want = align_py(ref, read, ORIGINAL_DEFAULT, strategy)
            # bypass the exact-substring shortcut for comparability
            if ref.tobytes().rfind(read.tobytes()) >= 0 and strategy in (
                    OverhangStrategy.SOFTCLIP, OverhangStrategy.IGNORE):
                continue
            got = align(ref, read, ORIGINAL_DEFAULT, strategy)
            assert got == want, (ref.tobytes(), read.tobytes(), strategy, got, want)


def test_parameter_set_values_match_reference():
    """Pin the four named parameter sets to the reference's values
    (smith_waterman_aligner.rs:11-25)."""
    from lorikeet_tpu.ops.smith_waterman import (
        ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS)

    def tup(p):
        return (p.match_value, p.mismatch_penalty, p.gap_open_penalty,
                p.gap_extend_penalty)

    assert tup(ORIGINAL_DEFAULT) == (3, -1, -4, -3)
    assert tup(STANDARD_NGS) == (25, -50, -110, -6)
    assert tup(NEW_SW_PARAMETERS) == (200, -150, -260, -11)
    assert tup(ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS) == (10, -15, -30, -5)
