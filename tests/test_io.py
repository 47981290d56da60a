"""I/O layer tests.

The reference repo's BAM fixtures are git-lfs pointers (not fetched), so BAM
tests round-trip through our own writer on simulated reads from the real
7seqs.fna reference sequence.
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.io.bam import BamReader
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.testkit.simulate import Variant, apply_variants, simulate_reads

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")


def test_fasta_7seqs():
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    assert len(fr.names) == 7
    # lengths must agree with the shipped .fai
    with open(os.path.join(DATA, "7seqs.fna.fai")) as fh:
        for line in fh:
            name, length = line.split("\t")[:2]
            assert fr.length(name) == int(length)
    seq = fr.fetch(fr.names[0], 0, 50)
    assert seq.size == 50
    assert set(seq.tobytes()) <= set(b"ACGTN")
    # windowed fetch equals slicing a full fetch
    full = fr.fetch(fr.names[1])
    assert np.array_equal(fr.fetch(fr.names[1], 100, 200), full[100:200])


def test_apply_variants_roundtrip():
    ref = np.frombuffer(b"ACGTACGTACGTACGTACGT", np.uint8)
    hap, segs = apply_variants(ref, [
        Variant(3, b"T", b"G"),
        Variant(7, b"T", b"TAA"),
        Variant(11, b"TACG", b"T"),
    ])
    assert hap.tobytes() == b"ACGGACGTAAACGTTACGT"
    # segment bookkeeping is self-consistent
    hap_len = sum(n for k, _, _, n in segs if k in "MI")
    ref_len = sum(n for k, _, _, n in segs if k in "MD")
    assert hap_len == len(hap) and ref_len == len(ref)


def test_bam_write_read_roundtrip(tmp_path):
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    name = "genome2~seq1"
    ref = fr.fetch(name)
    variants = [Variant(200, bytes(ref[200:201]), b"A" if ref[200] != ord("A") else b"C"),
                Variant(500, bytes(ref[500:503]), bytes(ref[500:501]))]
    recs = simulate_reads(ref, variants, coverage=20, seed=1, tid=2)
    assert len(recs) > 50
    path = str(tmp_path / "sim.bam")
    write_bam(path, fr.names, [fr.length(n) for n in fr.names], recs)

    br = BamReader(path)
    assert br.references == fr.names
    back = list(br.fetch(2))
    assert len(back) == len(recs)
    for a, b in zip(back, recs):
        assert a.name == b.name and a.pos == b.pos and a.flag == b.flag
        assert a.cigar == b.cigar
        assert np.array_equal(a.seq, b.seq)
        assert np.array_equal(a.qual, b.qual)
        assert a.tags.get("RG") == "sample0"
    # region fetch consistency
    window = list(br.fetch(2, 300, 400))
    expect = [r for r in recs if r.pos < 400 and r.reference_end > 300]
    assert len(window) == len(expect)


def test_simulated_cigars_consume_correctly():
    ref = np.frombuffer(bytes(np.random.default_rng(3).choice(
        np.frombuffer(b"ACGT", np.uint8), 2000)), np.uint8)
    variants = [Variant(400, bytes(ref[400:401]), b"T" if ref[400] != ord("T") else b"G"),
                Variant(900, bytes(ref[900:904]), bytes(ref[900:901])),
                Variant(1400, bytes(ref[1400:1401]), bytes(ref[1400:1401]) + b"GTC")]
    recs = simulate_reads(ref, variants, coverage=30, seed=2, error_rate=0.0)
    from lorikeet_tpu.io.bam import CIGAR_OPS, CONSUMES_QUERY
    for r in recs:
        qlen = sum(n for op, n in r.cigar if CONSUMES_QUERY[CIGAR_OPS.index(op)])
        assert qlen == len(r.seq), (r.name, r.cigar, len(r.seq))
        # reads not crossing any variant must be a single match op
        if r.reference_end < 380 or r.pos > 1450:
            assert len(r.cigar) == 1 and r.cigar[0][0] == "M"


def test_tag_array_roundtrip(tmp_path):
    """B-array and numpy-int tags survive a write/read round trip, with
    signed subtypes decoded as integers (SAM spec 'c'/'s' are int8/int16,
    not struct's char/bytes codes)."""
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    recs = simulate_reads(fr.fetch("genome2~seq1"), [], coverage=2,
                          seed=3, tid=2)
    recs[0].tags["XB"] = [1000, -2000, 7]
    recs[0].tags["XN"] = np.int64(42)
    recs[0].tags["XF"] = [0.5, -1.25]
    path = str(tmp_path / "tags.bam")
    write_bam(path, fr.names, [fr.length(n) for n in fr.names], recs)
    got = {(r.name, r.flag, r.pos): r for r in BamReader(path).fetch()}
    r0 = got[(recs[0].name, recs[0].flag, recs[0].pos)]
    assert r0.tags["XB"] == [1000, -2000, 7]
    assert r0.tags["XN"] == 42
    assert r0.tags["XF"] == [0.5, -1.25]


def test_read_vcf_registers_undeclared_contigs(tmp_path):
    """CHROMs missing from ##contig headers get their own tids instead of
    collapsing onto tid 0 (legal per VCF 4.2)."""
    from lorikeet_tpu.io.vcf import read_vcf
    p = tmp_path / "x.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "ctgA\t10\t.\tA\tT\t50\t.\t.\n"
        "ctgB\t20\t.\tC\tG\t50\t.\t.\n"
        "ctgA\t30\t.\tG\tC\t50\t.\t.\n")
    contexts, contigs, _ = read_vcf(str(p))
    assert contigs == ["ctgA", "ctgB"]
    assert [vc.tid for vc in contexts] == [0, 1, 0]


def test_open_bam_rejects_non_bam_with_clear_error(tmp_path):
    import pytest
    from lorikeet_tpu.io.bam import open_bam
    p = tmp_path / "fake.bam"
    p.write_bytes(b"version https://git-lfs.github.com/spec/v1\noid sha256:x")
    with pytest.raises(ValueError, match="git-lfs POINTER"):
        open_bam(str(p))
    p2 = tmp_path / "junk.bam"
    p2.write_bytes(b"not a bam at all")
    with pytest.raises(ValueError, match="not a BAM file"):
        open_bam(str(p2))
