"""Alignment thresholding filters (filter.rs:236-330)."""
import numpy as np

from lorikeet_tpu.io.bam import BamRecord, FLAG_PAIRED, FLAG_PROPER_PAIR
from lorikeet_tpu.io.filter import (
    AlignmentThresholds, apply_alignment_thresholds, read_pair_passes,
    single_read_passes,
)


def _rec(name, cigar, nm=0, flag=0):
    n = sum(l for op, l in cigar if op in "MIS=X")
    return BamRecord(name=name, flag=flag, tid=0, pos=100, mapq=60,
                     cigar=cigar, seq=np.full(n, ord("A"), np.uint8),
                     qual=np.full(n, 30, np.uint8), tags={"NM": nm})


def test_single_identity_filter():
    th = AlignmentThresholds(min_percent_identity_single=0.97)
    good = _rec("a", [("M", 100)], nm=2)     # 98% identity
    bad = _rec("b", [("M", 100)], nm=5)      # 95%
    assert single_read_passes(good, th)
    assert not single_read_passes(bad, th)


def test_single_aligned_percent_and_length():
    th = AlignmentThresholds(min_aligned_length_single=80,
                             min_aligned_percent_single=0.9)
    good = _rec("a", [("M", 95), ("S", 5)])
    bad_short = _rec("b", [("M", 50), ("S", 50)])
    assert single_read_passes(good, th)
    assert not single_read_passes(bad_short, th)


def test_pair_filter_uses_summed_lengths():
    th = AlignmentThresholds(min_aligned_length_pair=180)
    r1 = _rec("p", [("M", 100)], flag=FLAG_PAIRED | FLAG_PROPER_PAIR)
    r2 = _rec("p", [("M", 100)], flag=FLAG_PAIRED | FLAG_PROPER_PAIR)
    assert read_pair_passes(r1, r2, th)
    th2 = AlignmentThresholds(min_aligned_length_pair=250)
    assert not read_pair_passes(r1, r2, th2)


def test_apply_thresholds_drops_pair_together():
    th = AlignmentThresholds(min_percent_identity_pair=0.97)
    p1 = _rec("p", [("M", 100)], nm=5, flag=FLAG_PAIRED)
    p2 = _rec("p", [("M", 100)], nm=5, flag=FLAG_PAIRED)
    s1 = _rec("s", [("M", 100)], nm=0)
    out = apply_alignment_thresholds([p1, p2, s1], th)
    assert out == [s1]


def test_inactive_thresholds_noop():
    th = AlignmentThresholds()
    reads = [_rec("a", [("M", 10)], nm=9)]
    assert apply_alignment_thresholds(reads, th) == reads
