"""Read-clipper property tests over generated cigar permutations.

Python analogue of /root/reference/tests/read_clipper_unit_tests.rs +
src/test_utils/read_clipper_test_utils.rs: generate valid cigars, build
synthetic reads, clip, and assert the clipping invariants (alignment
bounds honored, cigar/sequence length consistency, reference-span
consistency).
"""
import itertools

import numpy as np
import pytest

from lorikeet_tpu.calling.clipping import (
    hard_clip_low_qual_ends, hard_clip_soft_clips, hard_clip_to_region,
    revert_soft_clips, soft_clip_low_qual_ends,
)
from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.utils.cigar import read_length, reference_length


def generate_cigars():
    """Valid cigars: optional leading/trailing S around 1-3 core elements
    (M/I/D, no adjacent repeats, starts/ends with M or I, at least one M)."""
    out = []
    cores = []
    for k in (1, 2, 3):
        for ops in itertools.product("MID", repeat=k):
            # the pipeline's read filter rejects consecutive indels and
            # edge deletions (read_utils.rs:44-66), so the clipper never
            # sees them
            if any(a == b or {a, b} == {"I", "D"}
                   for a, b in zip(ops, ops[1:])):
                continue
            if ops[0] == "D" or ops[-1] == "D":
                continue
            if "M" not in ops:
                continue
            cores.append(ops)
    for core in cores:
        for lead_s in (0, 2):
            for tail_s in (0, 2):
                cigar = []
                if lead_s:
                    cigar.append(("S", lead_s))
                cigar += [(op, 2) for op in core]
                if tail_s:
                    cigar.append(("S", tail_s))
                out.append(cigar)
    out.append([("M", 2), ("I", 3), ("M", 5)])
    return out


def make_read(cigar, pos=100):
    n = read_length(cigar)
    rng = np.random.default_rng(n)
    seq = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)]
    qual = np.full(n, 30, np.uint8)
    return BamRecord(name="r", flag=0, tid=0, pos=pos, mapq=60,
                     cigar=list(cigar), seq=seq, qual=qual)


def _consistent(rec):
    assert read_length(rec.cigar) == len(rec.seq) == len(rec.qual)
    assert rec.reference_end == rec.pos + reference_length(rec.cigar)


@pytest.mark.parametrize("cigar", generate_cigars())
def test_hard_clip_by_reference_coordinates(cigar):
    read = make_read(cigar)
    aln_start = read.pos
    aln_end = read.reference_end - 1      # inclusive
    for i in range(aln_start, aln_end + 1):
        # clip everything left of i: keep [i, inf)
        left = hard_clip_to_region(read, i, 1 << 60)
        if len(left.seq):
            assert left.pos >= min(aln_end, i)
            _consistent(left)
        # clip everything right of i: keep (-inf, i]
        right = hard_clip_to_region(read, -1, i)
        if len(right.seq) and right.cigar:
            assert right.reference_end - 1 <= max(aln_start, i)
            _consistent(right)


@pytest.mark.parametrize("cigar", generate_cigars())
def test_hard_clip_both_ends(cigar):
    read = make_read(cigar)
    aln_start, aln_end = read.pos, read.reference_end - 1
    span = aln_end - aln_start
    for i in range(0, span // 2 + 1):
        clipped = hard_clip_to_region(read, aln_start + i, aln_end - i)
        if len(clipped.seq) and clipped.cigar:
            assert clipped.pos >= aln_start + i
            assert clipped.reference_end - 1 <= aln_end - i
            _consistent(clipped)


@pytest.mark.parametrize("cigar", generate_cigars())
def test_hard_clip_low_qual_ends_properties(cigar):
    read = make_read(cigar)
    n = len(read.seq)
    for lo_bad in range(0, min(3, n)):
        q = np.full(n, 30, np.uint8)
        q[:lo_bad] = 2
        rec = make_read(cigar)
        rec.qual[:] = q
        out = hard_clip_low_qual_ends(rec, 9)
        if len(out.seq):
            _consistent(out)
            assert (out.qual > 9).all() or len(out.seq) == 0


@pytest.mark.parametrize("cigar", generate_cigars())
def test_soft_and_hard_clip_soft_clips(cigar):
    read = make_read(cigar)
    hard = hard_clip_soft_clips(read)
    if hard.cigar:
        assert all(op != "S" for op, _ in hard.cigar)
        _consistent(hard)
    reverted = revert_soft_clips(read)
    assert all(op != "S" for op, _ in reverted.cigar)
    _consistent(reverted)
    # reverting moves the alignment start back by the leading clip length
    lead_s = cigar[0][1] if cigar[0][0] == "S" else 0
    assert reverted.pos == read.pos - lead_s


def test_revert_soft_clips_before_contig_start():
    # read_clipper_unit_tests.rs:347: reverting cannot go below position 0
    for soft_start, aln_start in [(-5, 5), (-1, 1), (0, 0)]:
        lead = aln_start - soft_start
        cigar = [("S", lead), ("M", 10)] if lead else [("M", 10)]
        rec = make_read(cigar, pos=aln_start)
        out = revert_soft_clips(rec)
        assert out.pos >= 0
        _consistent(out)


@pytest.mark.parametrize("cigar", generate_cigars())
def test_soft_clip_low_qual_ends_keeps_length(cigar):
    rec = make_read(cigar)
    n = len(rec.seq)
    rec.qual[:1] = 2
    out = soft_clip_low_qual_ends(rec, 9)
    assert read_length(out.cigar) == n          # bases retained as S
    assert len(out.seq) == n
