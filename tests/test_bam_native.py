"""C++ BAM decoder parity vs the pure-Python fallback."""
import os

import numpy as np
import pytest

import lorikeet_tpu.io.bam as bam_mod
from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.io.bam_writer import write_bam


@pytest.fixture()
def bam_path(tmp_path):
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(300):
        ln = int(rng.integers(50, 150))
        seq = bases[rng.integers(0, 4, ln)]
        cigar = ([("S", 5), ("M", ln - 5)] if i % 7 == 0
                 else [("M", ln // 2), ("D", 2), ("M", ln - ln // 2)]
                 if i % 5 == 0 else [("M", ln)])
        recs.append(BamRecord(
            name=f"r{i}", flag=(1 | 32) if i % 2 else 0, tid=i % 2,
            pos=int(rng.integers(0, 5000)), mapq=int(rng.integers(0, 61)),
            cigar=cigar, seq=seq,
            qual=rng.integers(2, 41, ln).astype(np.uint8),
            mate_tid=i % 2, mate_pos=int(rng.integers(0, 5000)),
            tlen=int(rng.integers(-500, 500)),
            tags={"NM": int(rng.integers(0, 5)), "RG": "grp1"}))
    recs.sort(key=lambda r: (r.tid, r.pos))
    path = str(tmp_path / "t.bam")
    write_bam(path, ["c1", "c2"], [6000, 6000], recs,
              header_text="@HD\tVN:1.6\n@RG\tID:grp1\tSM:sampleX\n")
    return path


def test_native_decoder_used_and_matches_python(bam_path):
    import lorikeet_tpu.native.bam_native as bn
    r_native = bam_mod.BamReader(bam_path)
    assert r_native._native, "native decoder failed to load"

    orig = bn.inflate

    def boom(p):
        raise IOError("forced fallback")
    bn.inflate = boom
    try:
        r_py = bam_mod.BamReader(bam_path)
    finally:
        bn.inflate = orig
    assert not r_py._native

    assert r_native.references == r_py.references
    assert r_native.lengths == r_py.lengths
    assert r_native.sample_names() == r_py.sample_names() == ["sampleX"]
    for tid in (0, 1):
        a = list(r_native.fetch(tid))
        b = list(r_py.fetch(tid))
        assert len(a) == len(b) > 0
        for x, y in zip(a, b):
            assert (x.name, x.flag, x.pos, x.mapq, x.cigar) == \
                   (y.name, y.flag, y.pos, y.mapq, y.cigar)
            assert np.array_equal(x.seq, y.seq)
            assert np.array_equal(x.qual, y.qual)
            assert (x.mate_tid, x.mate_pos, x.tlen) == \
                   (y.mate_tid, y.mate_pos, y.tlen)
            assert dict(x.tags.items()) == dict(y.tags.items())


def test_bgzf_bsize_field_spec(bam_path):
    """BSIZE must be the total block size minus 1 (SAM spec 4.1)."""
    import struct
    raw = open(bam_path, "rb").read()
    xlen = struct.unpack_from("<H", raw, 10)[0]
    q, bsize = 12, None
    while q < 12 + xlen:
        si1, si2, slen = raw[q], raw[q + 1], struct.unpack_from("<H", raw, q + 2)[0]
        if si1 == 66 and si2 == 67:
            bsize = struct.unpack_from("<H", raw, q + 4)[0]
        q += 4 + slen
    next_block = bsize + 1
    assert raw[next_block:next_block + 2] in (b"\x1f\x8b", b""), \
        "BSIZE+1 must land on the next gzip member"


def test_long_read_mean_qual_with_empty_trailing_record(tmp_path):
    """Segment means must be exact when a zero-length (SEQ '*') record
    trails the file: reduceat-on-clipped-indices both overran and silently
    deflated the preceding read's mean (read_utils.rs:70-77 long filters)."""
    import numpy as np

    from lorikeet_tpu.io.bam import BamReader, BamRecord
    from lorikeet_tpu.io.bam_writer import write_bam
    recs = [
        BamRecord(name="lowq", flag=0, tid=0, pos=0, mapq=60,
                  cigar=[("M", 2000)], seq=np.full(2000, 65, np.uint8),
                  qual=np.full(2000, 10, np.uint8)),
        BamRecord(name="highq", flag=0, tid=0, pos=10, mapq=60,
                  cigar=[("M", 2000)], seq=np.full(2000, 65, np.uint8),
                  qual=np.full(2000, 50, np.uint8)),
        BamRecord(name="empty", flag=4, tid=0, pos=40, mapq=0, cigar=[],
                  seq=np.zeros(0, np.uint8), qual=np.zeros(0, np.uint8)),
    ]
    bam = str(tmp_path / "t.bam")
    write_bam(bam, ["c1"], [10000], recs)
    br = BamReader(bam)
    mask = br.filter_mask(0, 0, read_type="long", min_long_read_size=1500,
                          min_long_read_average_base_qual=45)
    assert list(mask) == [False, True, False]
