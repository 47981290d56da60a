"""Haplotype trimming to a narrower span, ported from the reference suite
(tests/assembly_result_set_unit_tests.rs: trimming_data/test_trim_to —
trimmed haplotypes must span exactly the new location with bases of the
new span's size; assembly_result_set.rs:398 trim_to dedups identical
trimmed haplotypes, reference haplotype winning)."""
import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import AssembledHaplotype
from lorikeet_tpu.calling.engine import trim_haplotypes_to_span

BASES = np.frombuffer(b"ACGT", np.uint8)


def _random_ref(n, seed=3):
    rng = np.random.default_rng(seed)
    return bytes(BASES[rng.integers(0, 4, n)])


def _snp_haps(ref, positions):
    """Ref haplotype + one SNP haplotype per position (full-M cigars), the
    reference test's construction (:96-117)."""
    haps = [AssembledHaplotype(ref, [("M", len(ref))], 0.0, True, 0)]
    for p in positions:
        b = bytearray(ref)
        b[p] = ord("C") if b[p] == ord("A") else ord("A")
        haps.append(AssembledHaplotype(bytes(b), [("M", len(ref))],
                                       0.0, False, 0))
    return haps


def test_trim_to_halved_span_snps_outside():
    # SNPs at window offsets 0..10; trim to the middle half: all SNPs fall
    # outside, every haplotype trims to the same ref slice -> dedup to one
    window_start = 1000
    length = 100
    ref = _random_ref(length)
    haps = _snp_haps(ref, range(11))
    lo = window_start + length // 4
    hi = window_start + 3 * length // 4
    out = trim_haplotypes_to_span(haps, lo, hi, window_start)
    assert out is not None
    for h in out:
        assert len(h.bases) == hi - lo + 1
        assert h.cigar == [("M", hi - lo + 1)]
        assert h.alignment_start_offset == 0
    assert len(out) == 1 and out[0].is_ref


def test_trim_to_keeps_inside_variation_distinct():
    window_start = 500
    length = 80
    ref = _random_ref(length, seed=9)
    inside = [30, 40, 50]
    outside = [2, 5, 75]
    haps = _snp_haps(ref, inside + outside)
    lo, hi = window_start + 20, window_start + 60
    out = trim_haplotypes_to_span(haps, lo, hi, window_start)
    assert out is not None
    # ref + the three inside SNP haplotypes stay distinct; outside ones merge
    assert len(out) == 1 + len(inside)
    for h in out:
        assert len(h.bases) == hi - lo + 1
    ref_slice = ref[20:61]
    assert out[0].is_ref and out[0].bases == ref_slice
    alt_bases = {h.bases for h in out[1:]}
    for p in inside:
        b = bytearray(ref_slice)
        b[p - 20] = ord("C") if b[p - 20] == ord("A") else ord("A")
        assert bytes(b) in alt_bases


def test_trim_with_indel_cigars():
    # a deletion haplotype: 30M 4D 66M over a 100bp window (96 read bases)
    window_start = 0
    ref = _random_ref(100, seed=11)
    del_bases = ref[:30] + ref[34:]
    haps = [
        AssembledHaplotype(ref, [("M", 100)], 0.0, True, 0),
        AssembledHaplotype(del_bases, [("M", 30), ("D", 4), ("M", 66)],
                           0.0, False, 0),
    ]
    out = trim_haplotypes_to_span(haps, 10, 89, window_start)
    assert out is not None and len(out) == 2
    assert out[0].bases == ref[10:90]
    # the deletion haplotype loses 4 ref bases within the span
    assert out[1].bases == ref[10:30] + ref[34:90]
    assert out[1].cigar == [("M", 20), ("D", 4), ("M", 56)]


def test_trim_edge_inside_deletion_bails():
    window_start = 0
    ref = _random_ref(100, seed=13)
    del_bases = ref[:30] + ref[40:]
    haps = [
        AssembledHaplotype(ref, [("M", 100)], 0.0, True, 0),
        AssembledHaplotype(del_bases, [("M", 30), ("D", 10), ("M", 60)],
                           0.0, False, 0),
    ]
    # lo=35 falls inside the deletion -> whole trim bails (haplotype.rs trim
    # returning None)
    assert trim_haplotypes_to_span(haps, 35, 89, window_start) is None


def test_trim_requires_full_coverage():
    ref = _random_ref(50, seed=17)
    haps = [AssembledHaplotype(ref, [("M", 50)], 0.0, True, 0),
            AssembledHaplotype(ref[5:], [("M", 45)], 0.0, False,
                               0, alignment_start_offset=5)]
    # second haplotype starts at ref pos 5 > lo=0 -> cannot cover the span
    assert trim_haplotypes_to_span(haps, 0, 49, 0) is None
    # but a span it does cover trims fine
    out = trim_haplotypes_to_span(haps, 10, 40, 0)
    assert out is not None and len(out) == 1  # identical slices dedup
    assert out[0].bases == ref[10:41]


def test_trim_boundary_insertions():
    """haplotype_unit_tests.rs:191-204: trimCigarByReference keeps boundary
    insertions, Haplotype.trim strips them and their bases."""
    cases = [
        (1, 5, [("M", 1), ("I", 2), ("M", 4)], b"CGTACGT"),
        (2, 5, [("M", 4)], b"ACGT"),
        (3, 5, [("M", 3)], b"CGT"),
        (0, 2, [("M", 2), ("I", 2), ("M", 1)], b"ACGTA"),
        (0, 1, [("M", 2)], b"AC"),
    ]
    for start, stop, exp_cigar, exp_bases in cases:
        hap = AssembledHaplotype(b"ACGTACGT",
                                 [("M", 2), ("I", 2), ("M", 4)],
                                 0.0, False, 0)
        out = trim_haplotypes_to_span([hap], 10 + start, 10 + stop, 10)
        assert out is not None, (start, stop)
        assert out[0].cigar == exp_cigar, (start, stop, out[0].cigar)
        assert out[0].bases == exp_bases


def test_trim_into_deletion_bails():
    """haplotype_unit_tests.rs:184-188: trims whose edges land inside a
    deletion return None."""
    hap = AssembledHaplotype(b"ACT", [("M", 1), ("D", 2), ("M", 2)],
                             0.0, False, 0)
    for start, stop in [(1, 2), (0, 2), (1, 3)]:
        assert trim_haplotypes_to_span([hap], 10 + start, 10 + stop,
                                       10) is None


def test_trim_exhaustive_match_windows():
    """haplotype_unit_tests.rs:148-180: every sub-interval of an all-match
    haplotype trims to the exact base slice."""
    full = b"ACGTAACCGGT"
    for s in range(len(full)):
        for e in range(s, len(full)):
            h = AssembledHaplotype(full, [("M", len(full))], 0.0, False, 0)
            out = trim_haplotypes_to_span([h], 10 + s, 10 + e, 10)
            assert out and out[0].bases == full[s:e + 1]
            assert out[0].cigar == [("M", e - s + 1)]
