"""Read clipping, region finalization, and physical phasing tests
(read_clipper.rs, fragment_utils.rs, assembly_based_caller_utils.rs:975)."""
import numpy as np

from lorikeet_tpu.calling.clipping import (
    adjust_overlapping_pair_quals, clip_by_read_indices, finalize_region_reads,
    hard_clip_adaptor_sequence, hard_clip_low_qual_ends, hard_clip_to_region,
    query_ref_positions, revert_soft_clips,
)
from lorikeet_tpu.calling.phasing import (
    construct_phase_set_mapping, phase_calls,
)
from lorikeet_tpu.io.bam import BamRecord, FLAG_MATE_REVERSE, FLAG_PAIRED, FLAG_REVERSE
from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext


def _rec(pos, cigar, seq=None, qual=None, flag=0, **kw):
    n = sum(l for op, l in cigar
            if op in "MIS=X")
    seq = np.frombuffer(seq or b"A" * n, np.uint8)
    qual = np.asarray(qual if qual is not None else [30] * n, np.uint8)
    return BamRecord(name="r", flag=flag, tid=0, pos=pos, mapq=60,
                     cigar=cigar, seq=seq.copy(), qual=qual.copy(), **kw)


def test_query_ref_positions_with_indels():
    r = _rec(100, [("M", 3), ("I", 2), ("M", 2), ("D", 4), ("M", 2)])
    rp = query_ref_positions(r).tolist()
    assert rp == [100, 101, 102, -1, -1, 103, 104, 109, 110]


def test_clip_by_read_indices_adjusts_pos_and_cigar():
    r = _rec(100, [("M", 10)])
    c = clip_by_read_indices(r, 3, 8)
    assert c.pos == 103 and c.cigar == [("M", 5)] and len(c.seq) == 5


def test_clip_keeps_interior_deletion_drops_edge():
    r = _rec(100, [("M", 4), ("D", 3), ("M", 4)])
    c = clip_by_read_indices(r, 2, 6)      # 2 M, D, 2 M
    assert c.cigar == [("M", 2), ("D", 3), ("M", 2)]
    c2 = clip_by_read_indices(r, 4, 8)     # starts right at the deletion
    assert c2.cigar == [("M", 4)] and c2.pos == 107


def test_hard_clip_low_qual_ends():
    r = _rec(50, [("M", 8)], qual=[2, 2, 30, 30, 30, 30, 2, 2])
    c = hard_clip_low_qual_ends(r, 9)
    assert c.pos == 52 and len(c.seq) == 4 and c.cigar == [("M", 4)]


def test_revert_soft_clips_extends_alignment():
    r = _rec(100, [("S", 3), ("M", 5), ("S", 2)])
    c = revert_soft_clips(r)
    assert c.pos == 97 and c.cigar == [("M", 10)]


def test_hard_clip_to_region():
    r = _rec(100, [("M", 10)])
    c = hard_clip_to_region(r, 103, 106)
    assert c.pos == 103 and c.cigar == [("M", 4)]


def test_adaptor_clip_forward_read():
    # forward read overrunning the fragment end at pos+|tlen|
    r = _rec(100, [("M", 10)], flag=FLAG_PAIRED | FLAG_MATE_REVERSE,
             mate_pos=98, tlen=6)
    c = hard_clip_adaptor_sequence(r)
    # boundary = 106; keep refpos <= 105
    assert c.cigar == [("M", 6)] and c.pos == 100


def test_adaptor_clip_reverse_read():
    r = _rec(100, [("M", 10)], flag=FLAG_PAIRED | FLAG_REVERSE,
             mate_pos=103, tlen=-6)
    c = hard_clip_adaptor_sequence(r)
    # boundary = 102; keep refpos >= 103
    assert c.pos == 103 and c.cigar == [("M", 7)]


def test_overlapping_pair_qual_adjustment():
    a = _rec(100, [("M", 6)], seq=b"ACGTAC", flag=FLAG_PAIRED)
    b = _rec(103, [("M", 6)], seq=b"TACGGG", flag=FLAG_PAIRED)
    adjust_overlapping_pair_quals([a, b])
    # overlap at ref 103-105: bases agree (TAC) -> capped at 20
    assert a.qual[:3].tolist() == [30, 30, 30]
    assert a.qual[3:].tolist() == [20, 20, 20]
    assert b.qual[:3].tolist() == [20, 20, 20]
    assert b.qual[3:].tolist() == [30, 30, 30]


def test_overlapping_pair_conflict_zeroed():
    a = _rec(100, [("M", 4)], seq=b"ACGT", flag=FLAG_PAIRED)
    b = _rec(103, [("M", 4)], seq=b"AAAA", flag=FLAG_PAIRED)
    adjust_overlapping_pair_quals([a, b])
    assert a.qual[3] == 0 and b.qual[0] == 0


def test_finalize_region_reads_drops_outside():
    inside = _rec(100, [("M", 10)])
    outside = _rec(500, [("M", 10)])
    out = finalize_region_reads({0: [inside, outside]}, 95, 120)
    assert len(out[0]) == 1 and out[0][0].pos == 100


def _call(pos, ref, alt):
    g = Genotype(0, 2)
    return VariantContext(0, pos, pos + len(ref) - 1,
                          [Allele(ref, True), Allele(alt, False)], [g])


def _ev(pos, ref, alt):
    return VariantContext(0, pos, pos + len(ref) - 1,
                          [Allele(ref, True), Allele(alt, False)])


def test_phase_in_phase_pair():
    calls = [_call(10, b"A", b"T"), _call(20, b"G", b"C")]
    # hap0 = ref-like (no events), hap1 carries both alts
    hap_events = [{}, {10: _ev(10, b"A", b"T"), 20: _ev(20, b"G", b"C")}]
    phase_calls(calls, hap_events)
    for c in calls:
        assert c.genotypes[0].attributes["PGT"] == "0|1"
        assert c.genotypes[0].attributes["PS"] == 11
    assert calls[0].genotypes[0].attributes["PID"] == "10_A_T"


def test_phase_anti_phase_pair():
    calls = [_call(10, b"A", b"T"), _call(20, b"G", b"C")]
    hap_events = [{10: _ev(10, b"A", b"T")}, {20: _ev(20, b"G", b"C")}]
    phase_calls(calls, hap_events)
    assert calls[0].genotypes[0].attributes["PGT"] == "0|1"
    assert calls[1].genotypes[0].attributes["PGT"] == "1|0"


def test_phase_conflict_aborts():
    # c0 and c1 share hap sets; c2 pairs with c1 first in conflict order ->
    # exercised via construct_phase_set_mapping directly
    calls = [_call(10, b"A", b"T"), _call(20, b"G", b"C"),
             _call(30, b"T", b"A")]
    hap_map = {0: {1}, 1: {2}, 2: {1, 2}}
    mapping = construct_phase_set_mapping(calls, hap_map)
    # 0 vs 1: disjoint and cover total -> group 0; 0 vs 2: comp_on_all ->
    # 2 joins group; consistent, no abort
    assert len(mapping) == 3


def test_overlapping_pair_quals_random_indel_cigars_match_naive():
    """The vectorized overlap correction must match a direct per-base
    dict implementation on random indel/soft-clip cigars
    (fragment_utils.rs:27-149)."""
    from lorikeet_tpu.calling.clipping import (
        HALF_PCR_SNV_QUAL, query_ref_positions,
    )

    def naive(first, second):
        rp1 = query_ref_positions(first)
        rp2 = query_ref_positions(second)
        m1 = {int(p): i for i, p in enumerate(rp1) if p >= 0}
        m2 = {int(p): i for i, p in enumerate(rp2) if p >= 0}
        for p in sorted(set(m1) & set(m2)):
            i, j = m1[p], m2[p]
            if first.seq[i] == second.seq[j]:
                first.qual[i] = min(first.qual[i], HALF_PCR_SNV_QUAL)
                second.qual[j] = min(second.qual[j], HALF_PCR_SNV_QUAL)
            else:
                first.qual[i] = 0
                second.qual[j] = 0

    rng = np.random.default_rng(7)
    ops = ["M", "I", "D", "S"]
    for trial in range(60):
        pair = []
        for pos in (100, 100 + int(rng.integers(0, 15))):
            cigar = []
            # S only at the ends; interior M/I/D runs
            if rng.random() < 0.3:
                cigar.append(("S", int(rng.integers(1, 4))))
            cigar.append(("M", int(rng.integers(3, 10))))
            for _ in range(int(rng.integers(0, 3))):
                op = ops[int(rng.integers(1, 3))]       # I or D
                cigar.append((op, int(rng.integers(1, 4))))
                cigar.append(("M", int(rng.integers(3, 8))))
            if rng.random() < 0.3:
                cigar.append(("S", int(rng.integers(1, 4))))
            n = sum(l for op, l in cigar if op in "MIS=X")
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), n)
            qual = rng.integers(5, 40, n).astype(np.uint8)
            pair.append(_rec(pos, cigar, seq=seq.tobytes(),
                             qual=qual, flag=FLAG_PAIRED))
        a, b = pair
        a2 = _rec(a.pos, a.cigar, seq=a.seq.tobytes(), qual=a.qual.copy(),
                  flag=FLAG_PAIRED)
        b2 = _rec(b.pos, b.cigar, seq=b.seq.tobytes(), qual=b.qual.copy(),
                  flag=FLAG_PAIRED)
        adjust_overlapping_pair_quals([a, b])
        first, second = sorted([a2, b2], key=lambda r: r.pos)
        if first.reference_end > second.pos:
            naive(first, second)
        assert a.qual.tolist() == a2.qual.tolist(), (trial, a.cigar, b.cigar)
        assert b.qual.tolist() == b2.qual.tolist(), (trial, a.cigar, b.cigar)
