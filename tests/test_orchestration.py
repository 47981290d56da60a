"""Multi-genome orchestration: discovery, per-genome outputs, caching
(lorikeet_engine.rs:77-520, reference_reader_utils.rs:160-311)."""
import os

import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.processing import discover_genomes, start_engine

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


def test_discover_genomes_tilde_grouping():
    specs = discover_genomes([os.path.join(DATA, "7seqs.fna")])
    names = sorted(s.name for s in specs)
    assert names == [f"genome{i}" for i in range(1, 7)]
    g1 = next(s for s in specs if s.name == "genome1")
    assert len(g1.contigs) == 2          # two random_sequence contigs


def test_discover_genomes_plain_fasta():
    specs = discover_genomes([os.path.join(DATA, "genome1.fna")])
    assert len(specs) == 1
    assert specs[0].name == "genome1"


def test_discover_genomes_directory(tmp_path):
    import shutil
    d = tmp_path / "genomes"
    d.mkdir()
    shutil.copy(os.path.join(DATA, "genome1.fna"), d / "a.fna")
    shutil.copy(os.path.join(DATA, "genome1.fna"), d / "b.fna")
    specs = discover_genomes([], genome_dir=str(d))
    assert sorted(s.name for s in specs) == ["a", "b"]


def test_start_engine_caching(tmp_path, sim_bam_7seqs):
    bam = sim_bam_7seqs
    out = str(tmp_path / "out")
    cfg = CallerConfig(use_pallas=False)
    r1 = start_engine("call", [os.path.join(DATA, "7seqs.fna")], [bam],
                      out, cfg)
    assert len(r1) == 6
    assert all(not v.get("cached") for v in r1.values())
    # second run hits the artifact cache; --force recomputes
    r2 = start_engine("call", [os.path.join(DATA, "7seqs.fna")], [bam],
                      out, cfg)
    assert all(v.get("cached") for v in r2.values())
    r3 = start_engine("call", [os.path.join(DATA, "7seqs.fna")], [bam],
                      out, cfg, force=True)
    assert all(not v.get("cached") for v in r3.values())


@pytest.fixture(scope="module")
def sim_bam_7seqs(tmp_path_factory):
    import numpy as np
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads
    tmp = tmp_path_factory.mktemp("orch")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = [Variant(300, bytes(ref[300:301]),
                        b"C" if ref[300] != ord("C") else b"T")]
    recs = simulate_reads(ref, variants, coverage=20, seed=3,
                          allele_fraction=1.0, tid=tid)
    bam = str(tmp / "s1.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names], recs)
    return bam


def test_start_engine_parallel_genomes(tmp_path, sim_bam_7seqs):
    bam = sim_bam_7seqs
    out = str(tmp_path / "par_out")
    cfg = CallerConfig(use_pallas=False)
    r = start_engine("call", [os.path.join(DATA, "7seqs.fna")], [bam],
                     out, cfg, parallel_genomes=3)
    assert len(r) == 6
    assert all("error" not in v for v in r.values())
    assert r["genome2"]["n_calls"] == 1


def test_start_engine_split_bams_equivalent(tmp_path, sim_bam_7seqs):
    bam = sim_bam_7seqs
    cfg = CallerConfig(use_pallas=False)
    ref = [os.path.join(DATA, "7seqs.fna")]
    out_a = str(tmp_path / "whole")
    out_b = str(tmp_path / "split")
    ra = start_engine("call", ref, [bam], out_a, cfg)
    rb = start_engine("call", ref, [bam], out_b, cfg, split_bams=True)
    assert all("error" not in v for v in rb.values())
    # split BAMs were materialized, one per (bam, genome)
    splits = os.listdir(os.path.join(out_b, "split_bams"))
    bams = [f for f in splits if f.endswith(".bam")]
    assert len(bams) == 6
    # every split BAM ships with its .bai (index_bams.rs finish_bams role)
    assert all(f + ".bai" in splits for f in bams)
    for g in ra:
        with open(ra[g]["vcf"]) as fa, open(rb[g]["vcf"]) as fb:
            body_a = [l for l in fa if not l.startswith("##")]
            body_b = [l for l in fb if not l.startswith("##")]
        assert body_a == body_b, g
