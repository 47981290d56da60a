"""Ported reference vectors: haplotype trimming
(tests/haplotype_unit_tests.rs:148-221 against haplotype.rs trim +
alignment_utils.rs get_bases_covering_ref_interval), driven through
trim_haplotypes_to_span (calling/engine.py) — the production trim path."""
import pytest

from lorikeet_tpu.assembly.graph import AssembledHaplotype
from lorikeet_tpu.calling.engine import trim_haplotypes_to_span


def _hap(bases: bytes, cigar, is_ref=False, offset=0):
    return AssembledHaplotype(bases, list(cigar), 0.0, is_ref, 21,
                              alignment_start_offset=offset)


def _trim(bases, cigar, window_start, hap_ref_start, lo, hi):
    hap = _hap(bases, cigar, offset=hap_ref_start - window_start)
    out = trim_haplotypes_to_span([hap], lo, hi, window_start)
    if out is None:
        return None
    assert len(out) == 1
    return out[0]


def test_trimming_all_match_sweep():
    """haplotype_unit_tests.rs:148-179 — every trim window of an all-M
    haplotype slices bases 1:1 and keeps an all-M cigar."""
    full = b"ACGTAACCGGT"
    loc_start, loc_end = 10, 20
    for trim_start in range(loc_start, loc_end):
        for trim_stop in range(trim_start, loc_end + 1):
            t = _trim(full, [("M", len(full))], 10, loc_start,
                      trim_start, trim_stop)
            s = trim_start - loc_start
            e = s + (trim_stop - trim_start) + 1
            assert t is not None, (trim_start, trim_stop)
            assert t.bases == full[s:e]
            assert t.cigar == [("M", e - s)]


def test_trim_edge_inside_deletion_returns_none():
    """:181-188 — a trim edge landing inside the 2D run cannot produce
    bases covering the span; the reference returns None."""
    full = b"ACT"                       # 1M2D2M over ref 10..14
    cigar = [("M", 1), ("D", 2), ("M", 2)]
    for lo, hi in ((11, 12), (10, 12), (11, 13)):
        assert _trim(full, cigar, 10, 10, lo, hi) is None


@pytest.mark.parametrize("lo,hi,want_cigar,want_bases", [
    (1, 5, [("M", 1), ("I", 2), ("M", 4)], b"CGTACGT"),  # no leading ins
    (2, 5, [("M", 4)], b"ACGT"),        # leading boundary insertion removed
    (3, 5, [("M", 3)], b"CGT"),
    (0, 2, [("M", 2), ("I", 2), ("M", 1)], b"ACGTA"),    # interior ins kept
    (0, 1, [("M", 2)], b"AC"),          # trailing boundary insertion removed
])
def test_trim_leading_and_trailing_insertions(lo, hi, want_cigar, want_bases):
    """:191-204 — boundary insertions are stripped with their bases;
    interior insertions survive.  Coordinates are ref-relative to the
    alignment start (here = window start = 0)."""
    t = _trim(b"ACGTACGT", [("M", 2), ("I", 2), ("M", 4)], 0, 0, lo, hi)
    assert t is not None
    assert t.cigar == want_cigar
    assert t.bases == want_bases


def test_bad_trim_span_not_covered():
    """:205-221 — a trim window outside the haplotype's reference span is
    an error upstream; here the caller-facing contract is None (keep the
    untrimmed region)."""
    assert _trim(b"ACGTAACCGGT", [("M", 11)], 10, 10, 1, 20) is None
    assert _trim(b"ACGTAACCGGT", [("M", 11)], 10, 10, 15, 30) is None
