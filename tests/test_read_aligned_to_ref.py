"""Read-vs-reference realignment conformance.

Property-style port of /root/reference/tests/alignment_utils_unit_tests.rs
make_read_aligned_to_ref_data / make_complex_read_aligned_to_ref:
reads are SW-aligned to a (possibly mutated) haplotype and composed through
the haplotype-vs-reference cigar; the realigned read must not pick up more
reference mismatches than the mutations it and the haplotype carry.
"""
import numpy as np
import pytest

from lorikeet_tpu.calling.realign import compose_to_reference
from lorikeet_tpu.ops.smith_waterman import (
    ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS, ORIGINAL_DEFAULT,
    OverhangStrategy, align,
)

HAP_BASES = b"ACTGAAGGTTCC"


def _read_aligned_to_ref(read_bases, hap_bases, hap_cigar, hap_ref_start):
    cigar, offset = align(hap_bases, read_bases,
                          ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS,
                          OverhangStrategy.SOFTCLIP)
    return compose_to_reference(cigar, offset, hap_cigar, hap_ref_start)


def test_all_m_read_realigns_to_hap_span():
    # make_read_aligned_to_ref_data: single-mismatch reads over an all-M
    # haplotype land at the haplotype start with an all-M cigar
    for i in range(-1, len(HAP_BASES)):
        bases = bytearray(HAP_BASES)
        if i >= 0:
            bases[i] = ord("A")
        pos, cigar = _read_aligned_to_ref(bytes(bases), HAP_BASES,
                                          [("M", len(HAP_BASES))], 10)
        assert pos == 10
        assert cigar == [("M", len(HAP_BASES))]


def test_insertions_at_front():
    # reads longer than the haplotype on the left become leading insertions
    for pad in range(1, 10):
        read = b"N" * pad + HAP_BASES
        pos, cigar = _read_aligned_to_ref(read, HAP_BASES,
                                          [("M", len(HAP_BASES))], 10)
        assert pos == 10
        assert cigar == [("I", pad), ("M", len(HAP_BASES))]


def _mismatch_count(read_bases, cigar, pos, reference):
    """AlignmentUtils::get_mismatch_count over aligned bases."""
    mm = 0
    q = 0
    r = pos
    for op, n in cigar:
        if op in "M=X":
            for k in range(n):
                if r + k < len(reference) and read_bases[q + k] != reference[r + k]:
                    mm += 1
            q += n
            r += n
        elif op in "IS":
            q += n
        elif op in "DN":
            r += n
    return mm


def _mutate(seq: bytes, rng, n_snp, n_ins, n_del):
    """Apply random SNPs/insertions/deletions; returns (seq, n_mismatches)."""
    out = bytearray(seq)
    n_mm = 0
    for _ in range(n_snp):
        i = int(rng.integers(1, len(out) - 1))
        old = out[i]
        new = ord("ACGT"[int(rng.integers(0, 4))])
        if new != old:
            n_mm += 1
        out[i] = new
    for _ in range(n_ins):
        i = int(rng.integers(1, len(out) - 1))
        out[i:i] = b"A"
    for _ in range(n_del):
        if len(out) > 4:
            i = int(rng.integers(1, len(out) - 2))
            del out[i]
    return bytes(out), n_mm


@pytest.mark.parametrize("seed", range(12))
def test_complex_read_aligned_to_ref(seed):
    rng = np.random.default_rng(seed)
    reference = b"ACTGACTGACTG"
    padded = b"NNNN" + reference + b"NNNN"
    n_snp = int(rng.integers(0, 3))
    n_ins = int(rng.integers(0, 2))
    n_del = int(rng.integers(0, 2))
    hap, hap_mm = _mutate(reference, rng, n_snp, n_ins, n_del)
    hap_cigar, hap_offset = align(padded, hap, ORIGINAL_DEFAULT,
                                  OverhangStrategy.SOFTCLIP)
    read, read_mm = _mutate(hap, rng, int(rng.integers(0, 3)), 0, 0)
    pos, cigar = _read_aligned_to_ref(read, hap, hap_cigar, hap_offset)
    if pos is None:
        pytest.skip("degenerate alignment")
    mm = _mismatch_count(read, cigar, pos, padded)
    # N padding bases count as mismatches only if the alignment leaks into
    # them; a correct composition stays within the real reference
    assert mm <= hap_mm + read_mm + n_ins + n_del, (
        hap, read, cigar, pos, mm)
