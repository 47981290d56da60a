"""Conformance: the native columnar finalizer (finalize.cpp) must be
record-identical to the Python finalize_region_reads chain
(assembly_based_caller_utils.rs:97-186 + fragment_utils.rs:27-149) over
BAMs with soft clips, indels, adaptor-overlapping pairs, and low-quality
tails."""
import os
import tempfile

import numpy as np
import pytest

from lorikeet_tpu.calling.clipping import (
    finalize_region_reads, finalize_region_reads_columnar,
)
from lorikeet_tpu.io.bam import (
    FLAG_MATE_REVERSE, FLAG_PAIRED, FLAG_PROPER_PAIR, FLAG_REVERSE,
    BamRecord, open_bam,
)
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.native.finalize_native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native finalize unavailable")


def _random_bam(tmp, rng, n_reads=120, contig_len=3000, with_pairs=True):
    ops = ["M", "I", "D"]
    recs = []
    for i in range(n_reads):
        pos = int(rng.integers(0, contig_len - 400))
        cigar = []
        if rng.random() < 0.4:
            cigar.append(("S", int(rng.integers(1, 12))))
        cigar.append(("M", int(rng.integers(20, 60))))
        for _ in range(int(rng.integers(0, 3))):
            op = ops[int(rng.integers(1, 3))]
            cigar.append((op, int(rng.integers(1, 5))))
            cigar.append(("M", int(rng.integers(10, 40))))
        if rng.random() < 0.4:
            cigar.append(("S", int(rng.integers(1, 12))))
        qlen = sum(n for op, n in cigar if op in "MIS")
        rlen = sum(n for op, n in cigar if op in "MD")
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), qlen)
        # low-quality tails with some probability so tail clipping engages
        qual = rng.integers(2, 40, qlen).astype(np.uint8)
        flag = 0
        mate_pos, tlen = -1, 0
        name = f"r{i:05d}"
        if with_pairs and rng.random() < 0.6:
            flag = FLAG_PAIRED | FLAG_PROPER_PAIR
            # mate placed to make overlapping / adaptor-crossing fragments
            frag = int(rng.integers(rlen - 15, rlen + 80))
            if rng.random() < 0.5:
                flag |= FLAG_MATE_REVERSE
                mate_pos = pos + max(frag - rlen, -10)
                tlen = frag
            else:
                flag |= FLAG_REVERSE
                mate_pos = max(0, pos - max(frag - rlen, -10))
                tlen = -frag
            # a second alignment with the same name sometimes (mate in
            # region -> the exactly-2 group path)
            if rng.random() < 0.5:
                m_cig = [("M", int(rng.integers(20, 60)))]
                m_qlen = m_cig[0][1]
                m_seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), m_qlen)
                # half the time copy the overlap bases so matches occur
                m_qual = rng.integers(2, 40, m_qlen).astype(np.uint8)
                m_flag = FLAG_PAIRED | FLAG_PROPER_PAIR | (
                    FLAG_REVERSE if not (flag & FLAG_REVERSE)
                    else FLAG_MATE_REVERSE)
                recs.append(BamRecord(name, m_flag, 0, int(mate_pos), 40,
                                      m_cig, m_seq, m_qual, 0, pos, -tlen))
        recs.append(BamRecord(name, flag, 0, pos, 40, cigar, seq, qual,
                              0, mate_pos, tlen))
    recs.sort(key=lambda r: (r.tid, r.pos))
    path = os.path.join(tmp, "fuzz.bam")
    write_bam(path, ["c1"], [contig_len], recs)
    return path


def _compare(bam, tid, sel, lo, hi, **kw):
    got = finalize_region_reads_columnar(bam, 0, sel, 7, lo, hi, **kw)
    assert got is not None
    want_reads = bam.records_at(0, sel, sample_index=7)
    want = finalize_region_reads({7: want_reads}, lo, hi, **kw)[7]
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g.name == w.name
        assert g.pos == w.pos, (g.name, g.pos, w.pos, w.cigar)
        assert g.cigar == w.cigar, (g.name, g.cigar, w.cigar)
        assert g.seq.tobytes() == w.seq.tobytes(), g.name
        assert g.qual.tolist() == w.qual.tolist(), (g.name, g.cigar)
        assert g.reference_end == w.reference_end
        assert g.flag == w.flag and g.mapq == w.mapq
        assert g.sample_index == 7
        assert g.tlen == w.tlen and g.mate_pos == w.mate_pos


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_matches_python_chain(seed):
    rng = np.random.default_rng(seed)
    with tempfile.TemporaryDirectory() as tmp:
        path = _random_bam(tmp, rng)
        bam = open_bam(path)
        if bam.columnar(0) is None:
            pytest.skip("non-columnar decode")
        n = len(bam.fetch_indices(0))
        lo = int(rng.integers(0, 1500))
        hi = lo + int(rng.integers(200, 900))
        sel = bam.fetch_indices(0, lo, hi + 1)
        for kw in (dict(),
                   dict(dont_use_soft_clipped_bases=True),
                   dict(soft_clip_low_quality_ends=True),
                   dict(min_base_quality=25),
                   dict(correct_overlapping_quals=False)):
            _compare(bam, 0, sel, lo, hi, **kw)
        # whole-contig region too (no clipping at the edges)
        _compare(bam, 0, np.arange(n), 0, 10**9)


def test_empty_selection():
    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as tmp:
        path = _random_bam(tmp, rng, n_reads=5)
        bam = open_bam(path)
        if bam.columnar(0) is None:
            pytest.skip("non-columnar decode")
        out = finalize_region_reads_columnar(
            bam, 0, np.zeros(0, np.int64), 0, 100, 200)
        assert out == []
