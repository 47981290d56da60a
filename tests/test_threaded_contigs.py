"""Contig-level host threading (cfg.threads) must produce identical calls
to the sequential path — the rayon contig-parallelism analogue
(haplotype_caller_engine.rs:443-465)."""
import os

import pytest

from lorikeet_tpu.calling.engine import CallerConfig, HaplotypeCallerEngine
from lorikeet_tpu.io.bam import BamReader
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.processing import GenomeSpec, run_genome
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


def test_threaded_equals_sequential(tmp_path):
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contigs = ["genome1~random_sequence_length_11000",
               "genome1~random_sequence_length_11010"]
    recs = []
    truth = []
    for ci, contig in enumerate(contigs):
        tid = fr.names.index(contig)
        ref = fr.fetch(contig)
        vs = [Variant(1000 + 500 * ci, bytes(ref[1000 + 500 * ci:1001 + 500 * ci]),
                      b"C" if ref[1000 + 500 * ci] != ord("C") else b"T"),
              Variant(5000, bytes(ref[5000:5001]),
                      b"G" if ref[5000] != ord("G") else b"A")]
        truth.append(vs)
        recs.extend(simulate_reads(ref, vs, coverage=25, seed=31 + ci,
                                   allele_fraction=1.0, tid=tid))
    bam = str(tmp_path / "s.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)))

    spec = GenomeSpec("genome1", os.path.join(DATA, "7seqs.fna"), contigs)

    def run(threads):
        cfg = CallerConfig(use_pallas=False, threads=threads)
        out = run_genome(spec, [BamReader(bam)],
                         str(tmp_path / f"out_t{threads}"), cfg, ["s0"])
        return sorted((l for l in open(out["vcf"]) if not l.startswith("#")))

    seq = run(1)
    par = run(4)
    assert len(seq) >= 4
    assert seq == par
