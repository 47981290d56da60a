"""Contig chunking equivalence: chunked calling with halos must produce the
same calls and depth RLE as a single whole-contig pass
(haplotype_caller_engine.rs:417 chunk sizing, SURVEY §5 haloing)."""
import os

import numpy as np
import pytest

import lorikeet_tpu.processing as processing
from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam import BamReader
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


def test_chunked_equals_whole_contig(tmp_path, monkeypatch):
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome1~random_sequence_length_11000"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = []
    for vpos in (1500, 4000, 4100, 8000, 10500):
        alt = b"C" if ref[vpos] != ord("C") else b"T"
        variants.append(Variant(vpos, bytes(ref[vpos:vpos + 1]), alt))
    recs = simulate_reads(ref, variants, coverage=25, seed=17,
                          allele_fraction=1.0, tid=tid)
    bam = str(tmp_path / "s.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names], recs)

    cfg = CallerConfig(use_pallas=False)
    bams = [BamReader(bam)]
    whole = processing.call_contig(fr, bams, contig, cfg)

    # force chunking: chunk size 2000 over the 11kb contig
    real_span = processing._call_span

    def tiny_chunks(*a, **k):
        return real_span(*a, **k)
    monkeypatch.setattr(processing, "_call_span", tiny_chunks)
    import lorikeet_tpu.calling.engine as eng
    orig = processing.call_contig

    # re-run with a small forced chunk size by monkeypatching the constant
    def chunked_call():
        cfg2 = CallerConfig(use_pallas=False)
        engine = eng.HaplotypeCallerEngine(cfg2)
        length = fr.length(contig)
        halo = (processing.MAX_ASSEMBLY_REGION_SIZE
                + processing.ASSEMBLY_REGION_PADDING + 50)
        result = None
        chunk = 2000
        for core_lo in range(0, length, chunk):
            core_hi = min(core_lo + chunk, length)
            part = processing._call_span(
                fr, [BamReader(bam)], contig, cfg2, engine,
                max(0, core_lo - halo), min(length, core_hi + halo),
                core_lo, core_hi)
            if result is None:
                result = part
            else:
                result.calls.extend(part.calls)
                processing._rle_concat(result.depth_pass_rle[0],
                                       part.depth_pass_rle[0])
        return result

    chunked = chunked_call()
    whole_pos = sorted(vc.start for vc in whole.calls)
    chunk_pos = sorted(vc.start for vc in chunked.calls)
    assert whole_pos == chunk_pos
    assert {v.pos for v in variants} <= set(chunk_pos)
    # depth RLE expands to the same mask
    def expand(rle, n):
        out = np.zeros(n, bool)
        p = 0
        for run in rle:
            ln = abs(run)
            if run > 0:
                out[p:p + ln] = True
            p += ln
        assert p == n
        return out
    n = fr.length(contig)
    assert np.array_equal(expand(whole.depth_pass_rle[0], n),
                          expand(chunked.depth_pass_rle[0], n))
