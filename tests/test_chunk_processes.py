"""Chunk-process parallelism: _span_task workers over manual spans must
reproduce the serial whole-contig result exactly (calls + depth RLE), and
results must survive pickling across the process boundary."""
import os
import pickle

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


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cp")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome1~random_sequence_length_11000"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = []
    for vpos in (1500, 4000, 8000, 10500):
        alt = b"C" if ref[vpos] != ord("C") else b"T"
        variants.append(Variant(vpos, bytes(ref[vpos:vpos + 1]), alt))
    recs = simulate_reads(ref, variants, coverage=25, seed=23,
                          allele_fraction=1.0, tid=tid)
    bam = str(tmp / "s.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names], recs)
    return fr, bam, contig


def _spans(length, chunk, halo):
    out = []
    for core_lo in range(0, length, chunk):
        core_hi = min(core_lo + chunk, length)
        out.append((max(0, core_lo - halo), min(length, core_hi + halo),
                    core_lo, core_hi))
    return out


def _merge(parts, n_samples):
    result = None
    for part in parts:
        if result is None:
            result = part
        else:
            result.calls.extend(part.calls)
            result.n_regions += part.n_regions
            result.n_active += part.n_active
            for s in range(n_samples):
                processing._rle_concat(result.depth_pass_rle[s],
                                       part.depth_pass_rle[s])
    return result


def test_span_task_matches_serial(dataset):
    fr, bam, contig = dataset
    cfg = CallerConfig(use_pallas=False)
    whole = processing.call_contig(fr, [BamReader(bam)], contig, cfg)

    halo = (cfg.max_assembly_region_size + cfg.assembly_region_padding + 50)
    spans = _spans(fr.length(contig), 4000, halo)
    assert len(spans) >= 3
    parts = [processing._span_task(
        pickle.loads(pickle.dumps((fr.path, [bam], contig, cfg, sp))))
        for sp in spans]
    merged = _merge([pickle.loads(pickle.dumps(p)) for p in parts], 1)

    assert merged.depth_pass_rle == whole.depth_pass_rle
    assert len(merged.calls) == len(whole.calls)
    for a, b in zip(merged.calls, whole.calls):
        assert (a.start, a.end) == (b.start, b.end)
        assert [al.bases for al in a.alleles] == [al.bases for al in b.alleles]


@pytest.mark.slow
def test_chunk_process_pool(dataset):
    """Real 2-process spawn pool over manual spans (validates the worker
    entry point under spawn: imports, reader cache, result pickling)."""
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    fr, bam, contig = dataset
    cfg = CallerConfig(use_pallas=False)
    whole = processing.call_contig(fr, [BamReader(bam)], contig, cfg)
    halo = (cfg.max_assembly_region_size + cfg.assembly_region_padding + 50)
    spans = _spans(fr.length(contig), 6000, halo)
    payloads = [(fr.path, [bam], contig, cfg, sp) for sp in spans]
    ctx = mp.get_context("spawn")
    with ProcessPoolExecutor(max_workers=2, mp_context=ctx) as pool:
        parts = list(pool.map(processing._span_task, payloads))
    merged = _merge(parts, 1)
    assert len(merged.calls) == len(whole.calls)
    assert merged.depth_pass_rle == whole.depth_pass_rle
