"""Multi-host chunk-level sharding (SURVEY §2.4 rows 1-2): two simulated
processes compute disjoint chunk shards of ONE genome; the gathering process
assembles a VCF identical to the single-process run.  Covers the region-queue
half of multi-host distribution that genome round-robin (parallel/hosts.py)
does not — the reference's region-level rayon parallelism
(assembly_region_walker.rs:139-141) spread across processes."""
import os

import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam import open_bam
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.io.vcf import read_vcf
from lorikeet_tpu.processing import (
    _contig_spans, _genome_units, discover_genomes, run_genome,
    run_genome_sharded,
)
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


def test_contig_spans_tile_and_halo():
    cfg = CallerConfig()
    halo = cfg.max_assembly_region_size + cfg.assembly_region_padding + 50
    spans = _contig_spans(0, 10_000, 3_000, cfg)
    # cores tile [lo, hi) exactly, in order, without gaps or overlap
    assert [(c_lo, c_hi) for _, _, c_lo, c_hi in spans] == \
        [(0, 3000), (3000, 6000), (6000, 9000), (9000, 10000)]
    # fetch windows extend by the halo, clamped to the contig
    assert spans[0][:2] == (0, 3000 + halo)
    assert spans[1][:2] == (3000 - halo, 6000 + halo)
    assert spans[-1][:2] == (9000 - halo, 10_000)


@pytest.fixture(scope="module")
def genome1_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunk_shard")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    spec = [s for s in discover_genomes([os.path.join(DATA, "7seqs.fna")])
            if s.name == "genome1"][0]
    assert len(spec.contigs) == 2
    recs = []
    truth = {}
    for contig in spec.contigs:
        tid = fr.names.index(contig)
        ref = fr.fetch(contig)
        variants = [
            Variant(400, bytes(ref[400:401]),
                    b"A" if ref[400] != ord("A") else b"G"),
            Variant(1200, bytes(ref[1200:1204]), bytes(ref[1200:1201])),
        ]
        truth[contig] = variants
        recs.extend(simulate_reads(ref, variants, coverage=25, seed=7,
                                   allele_fraction=1.0, error_rate=0.0,
                                   tid=tid))
    bam = str(tmp / "s1.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)), header_text=None)
    return spec, bam, truth


def test_genome_units_cover_contigs(genome1_bam):
    spec, bam, _ = genome1_bam
    fr = FastaReader(spec.fasta)
    units = _genome_units(spec, fr, CallerConfig(), n_samples=1)
    # both contigs are under one chunk (250kb/sample): one unit per contig
    assert [(ci, sp[2], sp[3]) for ci, sp in units] == \
        [(0, 0, fr.length(spec.contigs[0])),
         (1, 0, fr.length(spec.contigs[1]))]


def test_two_process_shards_match_single_process(genome1_bam, tmp_path):
    spec, bam, truth = genome1_bam
    cfg = CallerConfig(use_pallas=False)

    single_dir = str(tmp_path / "single")
    out_single = run_genome(spec, [open_bam(bam)], single_dir, cfg,
                            ["sample0"])

    shard_dir_root = str(tmp_path / "sharded")
    # worker (process 1 of 2) runs FIRST: writes only its own unit shards
    out_w = run_genome_sharded(spec, [open_bam(bam)], shard_dir_root, cfg,
                               ["sample0"], process_index=1, process_count=2)
    assert out_w == {"vcf": None, "role": "worker", "units": 2}
    import glob
    shard_dirs = glob.glob(os.path.join(shard_dir_root, ".shards-*"))
    assert len(shard_dirs) == 1               # fingerprinted shard dir
    shards = sorted(os.listdir(shard_dirs[0]))
    assert shards == ["u000001.pkl"]          # disjoint: odd units only
    # gatherer (process 0) computes the even units, waits, assembles
    out_g = run_genome_sharded(spec, [open_bam(bam)], shard_dir_root, cfg,
                               ["sample0"], process_index=0, process_count=2)
    assert out_g["n_calls"] == out_single["n_calls"]
    assert not glob.glob(os.path.join(shard_dir_root, ".shards-*"))

    ca, contigs_a, _ = read_vcf(out_single["vcf"])
    cb, contigs_b, _ = read_vcf(out_g["vcf"])
    assert contigs_a == contigs_b
    assert [(v.tid, v.start, v.alleles, v.log10_p_error) for v in ca] == \
        [(v.tid, v.start, v.alleles, v.log10_p_error) for v in cb]
    # the planted variants are in the gathered VCF on both contigs
    called = {(contigs_b[v.tid], v.start) for v in cb}
    for contig, variants in truth.items():
        for t in variants:
            assert (contig, t.pos) in called


def test_start_engine_chunk_shards_when_fewer_genomes_than_processes(
        genome1_bam, tmp_path, monkeypatch):
    """With fewer genomes than processes, start_engine keeps every genome on
    every process and shards at chunk granularity: workers write no VCF,
    the gathering process writes them all."""
    from lorikeet_tpu.processing import start_engine

    _, bam, _ = genome1_bam
    fna = os.path.join(DATA, "7seqs.fna")
    names = [s.name for s in discover_genomes([fna])]
    monkeypatch.setenv("LORIKEET_PROCESS_COUNT", "8")   # > 6 genomes
    out_dir = str(tmp_path / "out")
    cfg = CallerConfig(use_pallas=False)

    monkeypatch.setenv("LORIKEET_PROCESS_INDEX", "1")
    res_w = start_engine("call", [fna], [bam], out_dir, cfg)
    assert all(v.get("vcf") is None for v in res_w.values())
    vcfs = [os.path.join(out_dir, n, f"{n}.vcf") for n in names]
    assert not any(os.path.exists(p) for p in vcfs)

    monkeypatch.setenv("LORIKEET_PROCESS_INDEX", "0")
    res_g = start_engine("call", [fna], [bam], out_dir, cfg)
    assert sorted(res_g) == sorted(names)
    assert all(os.path.exists(p) for p in vcfs)


def test_gatherer_steals_shards_from_dead_worker(genome1_bam, tmp_path,
                                                 monkeypatch):
    """A worker that dies mid-run (here: before writing anything) must not
    stall the gatherer: after LORIKEET_SHARD_GRACE with no progress, process
    0 computes the missing units itself and still assembles the full VCF."""
    spec, bam, truth = genome1_bam
    cfg = CallerConfig(use_pallas=False)
    monkeypatch.setenv("LORIKEET_SHARD_GRACE", "0.2")

    dead_dir = str(tmp_path / "deadworker")
    # no worker process ever runs: every odd unit is "lost"
    out = run_genome_sharded(spec, [open_bam(bam)], dead_dir, cfg,
                             ["sample0"], process_index=0, process_count=2)
    assert out["vcf"] is not None
    cb, contigs_b, _ = read_vcf(out["vcf"])
    called = {(contigs_b[v.tid], v.start) for v in cb}
    for contig, variants in truth.items():
        for t in variants:
            assert (contig, t.pos) in called
