"""Mixed-technology (short + long read) calling and long-read filters
(read_utils.rs:70-77, haplotype_caller_engine.rs:515-546)."""
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.processing import _read_passes_filters, start_engine
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


def _long_rec(name, tid, pos, seq, qual):
    return BamRecord(name=name, flag=0, tid=tid, pos=pos, mapq=60,
                     cigar=[("M", len(seq))],
                     seq=np.asarray(seq, np.uint8),
                     qual=np.full(len(seq), qual, np.uint8))


def test_long_read_filters():
    seq = np.full(2000, ord("A"), np.uint8)
    good = _long_rec("a", 0, 0, seq, 25)
    short = _long_rec("b", 0, 0, seq[:800], 25)
    lowq = _long_rec("c", 0, 0, seq, 10)
    assert _read_passes_filters(good, read_type="long")
    assert not _read_passes_filters(short, read_type="long")
    assert not _read_passes_filters(lowq, read_type="long")
    # the same records pass as short reads
    assert _read_passes_filters(short, read_type="short")


def test_mixed_short_long_calling(tmp_path):
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome1~random_sequence_length_11000"   # 11 kb contig
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    vpos = 5000
    alt_base = b"C" if ref[vpos] != ord("C") else b"T"
    variants = [Variant(vpos, bytes(ref[vpos:vpos + 1]), alt_base)]

    short_recs = simulate_reads(ref, variants, coverage=20, seed=9,
                                allele_fraction=1.0, tid=tid)
    short_bam = str(tmp_path / "short.bam")
    write_bam(short_bam, fr.names, [fr.length(n) for n in fr.names],
              short_recs)

    # 2 kb long reads spanning the variant
    hap = np.array(ref, np.uint8).copy()
    hap[vpos] = alt_base[0]
    rng = np.random.default_rng(3)
    long_recs = []
    for i in range(8):
        start = vpos - 1000 + int(rng.integers(0, 200))
        end = min(len(hap), start + 2000)
        long_recs.append(_long_rec(f"L{i}", tid, start, hap[start:end], 25))
    long_recs.sort(key=lambda r: r.pos)
    long_bam = str(tmp_path / "long.bam")
    write_bam(long_bam, fr.names, [fr.length(n) for n in fr.names],
              long_recs)

    cfg = CallerConfig(use_pallas=False)
    out = start_engine("call", [os.path.join(DATA, "7seqs.fna")],
                       [short_bam], str(tmp_path / "out"), cfg,
                       long_bam_paths=[long_bam])
    vcf = out["genome1"]["vcf"]
    body = [l for l in open(vcf) if not l.startswith("#")]
    assert len(body) >= 1
    rec = next(l for l in body if int(l.split("\t")[1]) == vpos + 1)
    cols = rec.rstrip("\n").split("\t")
    assert len(cols) == 11          # two samples -> two genotype columns
    # both technologies support the alt
    for gt_cell in cols[9:]:
        assert gt_cell.startswith("1/1") or gt_cell.startswith("0/1")
