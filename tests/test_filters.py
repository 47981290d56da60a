"""Alignment thresholding filters (filter.rs:236-330)."""
import numpy as np

from lorikeet_tpu.io.bam import (
    BamRecord, FLAG_PAIRED, FLAG_PROPER_PAIR, FLAG_SUPPLEMENTARY,
)
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
    """Pair mode is strict (filter.rs:101-215): non-proper pairs and
    unpaired reads are dropped, a failing pair is dropped as a unit."""
    th = AlignmentThresholds(min_percent_identity_pair=0.97)
    pp = FLAG_PAIRED | FLAG_PROPER_PAIR
    p1 = _rec("p", [("M", 100)], nm=5, flag=pp)     # 95% combined
    p2 = _rec("p", [("M", 100)], nm=5, flag=pp)
    q1 = _rec("q", [("M", 100)], nm=1, flag=pp)     # 99% combined
    q2 = _rec("q", [("M", 100)], nm=1, flag=pp)
    improper = _rec("i", [("M", 100)], nm=0, flag=FLAG_PAIRED)
    single = _rec("s", [("M", 100)], nm=0)
    out = apply_alignment_thresholds([p1, p2, q1, q2, improper, single], th)
    assert out == [q1, q2]


def test_pair_mode_skips_supplementary_records():
    """A kept supplementary alignment must not break name-pairing: the two
    primaries are judged as a pair; the supplementary itself is dropped
    (filter.rs:121-123 skips secondary/supplementary outright)."""
    th = AlignmentThresholds(min_percent_identity_pair=0.97)
    pp = FLAG_PAIRED | FLAG_PROPER_PAIR
    r1 = _rec("n", [("M", 100)], nm=1, flag=pp)
    r2 = _rec("n", [("M", 100)], nm=1, flag=pp)
    sup = _rec("n", [("M", 50), ("S", 50)], nm=0,
               flag=pp | FLAG_SUPPLEMENTARY)
    out = apply_alignment_thresholds([r1, sup, r2], th)
    assert out == [r1, r2]
    # and a failing pair is dropped even with the supplementary present
    th2 = AlignmentThresholds(min_percent_identity_pair=0.995)
    assert apply_alignment_thresholds([r1, sup, r2], th2) == []


def test_inactive_thresholds_noop():
    th = AlignmentThresholds()
    reads = [_rec("a", [("M", 10)], nm=9)]
    assert apply_alignment_thresholds(reads, th) == reads


def test_filter_mask_matches_predicate(tmp_path):
    """Vectorized decode-time filter_mask must agree with the per-record
    _read_passes_filters predicate for every flag/mapq/length combination."""
    import numpy as np
    from lorikeet_tpu.io.bam import BamReader
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.io.filter import FlagFilter
    from lorikeet_tpu.processing import _read_passes_filters
    from lorikeet_tpu.testkit.simulate import simulate_reads

    rng = np.random.default_rng(17)
    B4 = np.frombuffer(b"ACGT", np.uint8)
    ref = B4[rng.integers(0, 4, 3000)]
    recs = simulate_reads(ref, [], coverage=20, seed=2, tid=0)
    # scramble flags/mapq to hit every filter branch
    import dataclasses
    out = []
    for i, r in enumerate(recs):
        flag = r.flag
        if i % 5 == 1:
            flag |= 0x400            # dup
        if i % 5 == 2:
            flag |= 0x800            # supplementary
        if i % 7 == 3:
            flag |= 0x200            # qcfail
        if i % 7 == 4:
            flag = (flag | 0x1) & ~0x2   # improper pair
        if i % 11 == 5:
            flag |= 0x100            # secondary
        mapq = [60, 10, 255, 0, 30][i % 5]
        out.append(dataclasses.replace(r, flag=flag, mapq=mapq))
    bam = str(tmp_path / "flags.bam")
    write_bam(bam, ["c"], [3000], sorted(out, key=lambda r: r.pos),
              header_text=None)
    reader = BamReader(bam)
    for ff in (FlagFilter(), FlagFilter(include_improper_pairs=True),
               FlagFilter(include_supplementary=False)):
        mask = reader.filter_mask(
            0, 20, read_type="short",
            include_improper_pairs=ff.include_improper_pairs,
            include_supplementary=ff.include_supplementary)
        recs0 = list(reader.fetch(0))
        assert mask is not None and len(mask) == len(recs0)
        for k, rec in enumerate(recs0):
            want = _read_passes_filters(rec, 20, flag_filter=ff)
            assert mask[k] == want, (k, rec.flag, rec.mapq, mask[k], want)
