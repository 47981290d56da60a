"""Per-contig checkpoint/resume (--checkpoint): a rerun loads contig
results from {genome}/.chunks instead of recalling, keys invalidate on
config change, and --force clears the cache (SURVEY §5: checkpointed
region queues beyond the reference's genome-level artifact cache,
lorikeet_engine.rs:135-157)."""
import glob
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.processing import start_engine
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

BASES = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    rng = np.random.default_rng(3)
    L = 9000
    fasta = tmp / "g.fna"
    refs = {}
    with open(fasta, "w") as fh:
        for c in ("c1", "c2"):
            ref = BASES[rng.integers(0, 4, L)]
            refs[c] = ref
            fh.write(f">{c}\n")
            s = ref.tobytes().decode()
            for i in range(0, L, 80):
                fh.write(s[i:i + 80] + "\n")
    recs = []
    for tid, c in enumerate(("c1", "c2")):
        ref = refs[c]
        v = [Variant(3000, bytes(ref[3000:3001]),
                     b"T" if ref[3000] != ord("T") else b"G")]
        recs += simulate_reads(ref, v, coverage=20, seed=tid, tid=tid,
                               name_prefix=f"t{tid}_")
    recs.sort(key=lambda r: (r.tid, r.pos))
    bam = str(tmp / "s.bam")
    write_bam(bam, ["c1", "c2"], [L, L], recs)
    return str(fasta), bam, tmp


def _run(fasta, bam, out, **cfg_kw):
    cfg = CallerConfig(use_pallas=False, checkpoint=True, **cfg_kw)
    return start_engine("call", [fasta], [bam], str(out), cfg, force=True)


def test_checkpoint_writes_and_resumes(dataset, monkeypatch):
    fasta, bam, tmp = dataset
    out = tmp / "out1"
    res = _run(fasta, bam, out)["g"]
    chunks = glob.glob(str(out / "g" / ".chunks" / "*.pkl"))
    assert len(chunks) == 2  # one per contig
    n_before = sum(1 for _ in open(res["vcf"]) if not _.startswith("#"))

    # resume: calling must not run again — poison call_contig to prove it
    import lorikeet_tpu.processing as P

    def boom(*a, **k):
        raise AssertionError("call_contig ran despite checkpoints")
    monkeypatch.setattr(P, "call_contig", boom)
    # force=True reruns the genome but (with checkpoints intact after the
    # rmtree happens only when force AND checkpoint... ) — use a fresh out
    # dir with pre-seeded chunks to exercise the resume path
    out2 = tmp / "out2"
    (out2 / "g" / ".chunks").mkdir(parents=True)
    for p in chunks:
        dst = out2 / "g" / ".chunks" / os.path.basename(p)
        dst.write_bytes(open(p, "rb").read())
    cfg = CallerConfig(use_pallas=False, checkpoint=True)
    res2 = start_engine("call", [fasta], [bam], str(out2), cfg)["g"]
    n_after = sum(1 for _ in open(res2["vcf"]) if not _.startswith("#"))
    assert n_after == n_before == 2


def test_checkpoint_key_invalidates_on_config_change(dataset):
    fasta, bam, tmp = dataset
    out = tmp / "out3"
    _run(fasta, bam, out)
    keys1 = {os.path.basename(p)
             for p in glob.glob(str(out / "g" / ".chunks" / "*.pkl"))}
    # different calling config -> different keys -> recompute; --force wipes
    # the old checkpoints so only the new config's keys remain
    _run(fasta, bam, out, min_base_quality=12)
    keys2 = {os.path.basename(p)
             for p in glob.glob(str(out / "g" / ".chunks" / "*.pkl"))}
    assert len(keys1) == 2 and len(keys2) == 2
    assert not keys1 & keys2


def test_force_clears_chunks(dataset):
    fasta, bam, tmp = dataset
    out = tmp / "out4"
    _run(fasta, bam, out)
    marker = out / "g" / ".chunks" / "stale.pkl"
    marker.write_bytes(b"junk")
    _run(fasta, bam, out)   # force=True again
    assert not marker.exists()
