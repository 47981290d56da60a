"""BAI index + streaming BAM reader tests.

The reference's indexed access contract: every region fetch goes through the
.bai (bam_generator.rs:48 IndexedNamedBamReader; index built by finish_bams,
index_bams.rs:17-80).  Here: index write-on-write == index built by scanning,
and the streaming reader's fetches/VCFs match the eager whole-file reader's
exactly.
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.io.bai import (
    BgzfFile, RefIndex, build_bai, read_bai, reg2bin, reg2bins, write_bai,
)
from lorikeet_tpu.io.bam import BamReader, StreamingBamReader, open_bam
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"


def _mk_bam(tmp, n_contigs=2, length=30000, coverage=8.0, seed=3,
            name="t.bam", index=True):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    names = [f"c{k}" for k in range(n_contigs)]
    refs = [bases[rng.integers(0, 4, length)] for _ in range(n_contigs)]
    recs = []
    for t, ref in enumerate(refs):
        recs.extend(simulate_reads(ref, coverage=coverage, seed=seed + t,
                                   tid=t))
    recs.sort(key=lambda r: (r.tid, r.pos))
    path = str(tmp / name)
    write_bam(path, names, [length] * n_contigs, recs, index=index)
    return path, names, refs, recs


def test_reg2bin_reg2bins_consistency():
    rng = np.random.default_rng(0)
    for _ in range(200):
        beg = int(rng.integers(0, 1 << 28))
        end = beg + int(rng.integers(1, 10000))
        b = reg2bin(beg, end)
        # the record's own bin must be a candidate for any query hitting it
        q0 = max(0, beg - 5)
        assert b in reg2bins(q0, end + 5)
        assert b in reg2bins(beg, beg + 1)


def test_write_bam_emits_bai(tmp_path):
    path, names, refs, recs = _mk_bam(tmp_path)
    assert os.path.exists(path + ".bai")
    idx = read_bai(path + ".bai")
    assert len(idx) == 2
    n = sum(r.n_mapped + r.n_unmapped for r in idx)
    assert n == len(recs)


def test_build_bai_matches_inline_index(tmp_path):
    path, *_ = _mk_bam(tmp_path)
    rebuilt = str(tmp_path / "rebuilt.bai")
    build_bai(path, rebuilt)
    a = read_bai(path + ".bai")
    b = read_bai(rebuilt)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.bins == rb.bins
        assert ra.ioffset == rb.ioffset
        assert (ra.n_mapped, ra.n_unmapped) == (rb.n_mapped, rb.n_unmapped)
        assert (ra.off_beg, ra.off_end) == (rb.off_beg, rb.off_end)


def test_bai_roundtrip(tmp_path):
    r = RefIndex()
    r.add(100, 250, (10 << 16) | 5, (10 << 16) | 900)
    r.add(300, 400, (10 << 16) | 900, (11 << 16) | 2)
    r.add(100_000, 100_100, (40 << 16) | 0, (41 << 16) | 7)
    r.finalize()
    p = str(tmp_path / "x.bai")
    write_bai(p, [r], n_no_coor=3)
    back = read_bai(p)[0]
    assert back.bins == r.bins
    assert back.ioffset == r.ioffset
    assert (back.n_mapped, back.n_unmapped) == (3, 0)


def test_streaming_fetch_matches_eager(tmp_path):
    path, names, refs, recs = _mk_bam(tmp_path, length=60000, coverage=6.0)
    eager = BamReader(path)
    stream = StreamingBamReader(path)
    assert stream.references == eager.references
    assert stream.lengths == eager.lengths
    for tid in (0, 1):
        for lo, hi in [(0, 5000), (17000, 22000), (55000, 60000),
                       (0, 60000)]:
            a = [(r.name, r.pos, r.flag) for r in eager.fetch(tid, lo, hi)]
            b = [(r.name, r.pos, r.flag) for r in stream.fetch(tid, lo, hi)]
            assert a == b, (tid, lo, hi, len(a), len(b))


def test_streaming_whole_tid_stream(tmp_path):
    path, names, refs, recs = _mk_bam(tmp_path)
    eager = BamReader(path)
    stream = StreamingBamReader(path)
    for tid in (0, 1):
        a = [(r.name, r.pos) for r in eager.fetch(tid)]
        b = [(r.name, r.pos) for r in stream.fetch(tid)]
        assert a == b
    assert stream.count() == eager.count()


def test_streaming_window_columnar_consistency(tmp_path):
    """filter_mask + fetch_indices + records_at on a prepared window give
    the same record set as the eager reader (window-relative indices)."""
    path, *_ = _mk_bam(tmp_path, length=40000, coverage=10.0)
    eager = BamReader(path)
    stream = StreamingBamReader(path)
    lo, hi = 9000, 15000
    stream.prepare_span(0, lo, hi)
    sm = stream.filter_mask(0, 20)
    em = eager.filter_mask(0, 20)
    sidx = stream.fetch_indices(0, lo, hi, mask=sm)
    eidx = eager.fetch_indices(0, lo, hi, mask=em)
    srecs = stream.records_at(0, sidx)
    erecs = eager.records_at(0, eidx)
    assert [(r.name, r.pos, r.cigar) for r in srecs] \
        == [(r.name, r.pos, r.cigar) for r in erecs]
    # columnar views agree on the window's reads
    sc, ec = stream.columnar(0), eager.columnar(0)
    if sc is not None and ec is not None:
        np.testing.assert_array_equal(sc["pos"][sidx], ec["pos"][eidx])
        np.testing.assert_array_equal(sc["ends"][sidx], ec["ends"][eidx])


def test_streaming_e2e_vcf_identical(tmp_path):
    """run_call over streaming readers == eager readers, byte for byte."""
    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.processing import run_call
    import lorikeet_tpu.io.bam as bam_mod

    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = [Variant(200, bytes(ref[200:201]),
                        b"A" if ref[200] != ord("A") else b"G"),
                Variant(500, bytes(ref[500:505]), bytes(ref[500:501]))]
    recs = simulate_reads(ref, variants, coverage=30, seed=5,
                          allele_fraction=0.5, tid=tid)
    bam = str(tmp_path / "s.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)))
    cfg = CallerConfig(use_pallas=False)
    v_eager = run_call(os.path.join(DATA, "7seqs.fna"), [bam],
                       str(tmp_path / "eager"), cfg)
    orig = bam_mod.open_bam
    try:
        bam_mod.open_bam = lambda p, **kw: orig(p, streaming=True)
        import lorikeet_tpu.processing as proc
        proc.open_bam = bam_mod.open_bam
        v_stream = run_call(os.path.join(DATA, "7seqs.fna"), [bam],
                            str(tmp_path / "stream"), cfg)
    finally:
        bam_mod.open_bam = orig
        import lorikeet_tpu.processing as proc
        proc.open_bam = orig
    a = open(v_eager).read()
    b = open(v_stream).read()
    assert a == b
    assert "genome2~seq1\t201\t" in a  # the planted SNP is present


def test_open_bam_threshold(tmp_path, monkeypatch):
    path, *_ = _mk_bam(tmp_path)
    monkeypatch.setenv("LORIKEET_EAGER_BAM_MAX", "1")
    r = open_bam(path)
    assert isinstance(r, StreamingBamReader)
    r2 = open_bam(path, high_memory=True)
    assert not r2.is_streaming
    monkeypatch.setenv("LORIKEET_EAGER_BAM_MAX", str(1 << 40))
    assert not open_bam(path).is_streaming


def test_bgzf_voffset_range_roundtrip(tmp_path):
    path, *_ = _mk_bam(tmp_path)
    import gzip
    full = gzip.open(path, "rb").read()
    bg = BgzfFile(path)
    idx = read_bai(path + ".bai")
    # read every chunk of every bin and confirm it is a slice of the stream
    for r in idx:
        for chunks in r.bins.values():
            for v_beg, v_end in chunks:
                data = bg.read_voffset_range(v_beg, v_end)
                assert data and data in full
    bg.close()
