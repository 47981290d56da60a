"""Persistent span-worker pool (parallel.pool): identical results to the
serial path, reuse across genomes, and the parent device-service RPC
(exercised on CPU with forced remote routing)."""
import os
import tempfile

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig, HaplotypeCallerEngine
from lorikeet_tpu.io.bam import open_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.parallel import pool as pool_mod
from lorikeet_tpu.processing import call_contig


def _dataset(tmp, kbp=120, samples=2, seed=0):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench_e2e
    return bench_e2e.simulate_dataset(tmp, kbp, samples, 25.0, seed=seed)


def _key(calls):
    return [(c.tid, c.start, tuple(a.bases for a in c.alleles),
             tuple(tuple(g.alleles[i].bases for i in range(len(g.alleles)))
                   for g in c.genotypes))
            for c in calls]


@pytest.fixture(autouse=True)
def _fresh_pool():
    yield
    pool_mod.shutdown_pool()


def test_pool_matches_serial():
    with tempfile.TemporaryDirectory() as tmp:
        fasta, bams, truth = _dataset(tmp)
        cfg = CallerConfig(use_pallas=False, threads=2)
        fr = FastaReader(fasta)
        readers = [open_bam(p) for p in bams]
        serial = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg))
        pool = pool_mod.get_pool(fasta, bams, cfg, 2, device_service=False)
        pooled = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg), pool=pool)
        assert _key(pooled.calls) == _key(serial.calls)
        assert pooled.n_regions == serial.n_regions
        assert pooled.depth_pass_rle == serial.depth_pass_rle


def test_pool_reused_across_genomes():
    with tempfile.TemporaryDirectory() as tmp:
        fasta1, bams1, _ = _dataset(tmp, seed=0)
        cfg = CallerConfig(use_pallas=False, threads=2)
        pool1 = pool_mod.get_pool(fasta1, bams1, cfg, 2,
                                  device_service=False)
        pids = [w.pid for w in pool1.workers]
        tmp2 = os.path.join(tmp, "g2")
        os.makedirs(tmp2)
        fasta2, bams2, truth2 = _dataset(tmp2, kbp=60, seed=3)
        pool2 = pool_mod.get_pool(fasta2, bams2, cfg, 2,
                                  device_service=False)
        assert [w.pid for w in pool2.workers] == pids  # same live workers
        fr2 = FastaReader(fasta2)
        readers2 = [open_bam(p) for p in bams2]
        res = call_contig(fr2, readers2, "contig1", cfg,
                          HaplotypeCallerEngine(cfg), pool=pool2)
        serial = call_contig(fr2, readers2, "contig1", cfg,
                             HaplotypeCallerEngine(cfg))
        assert _key(res.calls) == _key(serial.calls)


def _fake_device(monkeypatch, fail_after=None):
    """Patch the service's device seam (enqueue_grouped_jobs/readback)
    with a host implementation that DECODES the shipped jobs — wire
    nibbles, qual codebook, block tables — exactly as the chip would,
    then computes each block row with the exact f64 kernel.  This makes
    the pool RPC tests a conformance check of the whole job protocol."""
    import lorikeet_tpu.ops.pairhmm_pallas as P
    from lorikeet_tpu.ops.pairhmm import pairhmm_forward_np
    from lorikeet_tpu.ops.pairhmm_native import pairhmm_forward_native_batch

    def decode_wire(payload):
        qidx, base_nib, hap_nib, cb, sym_tab, lens = payload

        def unnib(pk):
            lo = pk & 0xF
            hi = pk >> 4
            return np.stack([lo, hi], axis=-1).reshape(pk.shape[0], -1)

        rdp = sym_tab[unnib(base_nib)]
        hap_u8 = sym_tab[unnib(hap_nib)]
        v = cb[qidx.astype(np.int64)]
        return ((v & 0xFF).astype(np.uint8),
                ((v >> 8) & 0xFF).astype(np.uint8),
                ((v >> 16) & 0xFF).astype(np.uint8),
                ((v >> 24) & 0xFF).astype(np.uint8),
                rdp, hap_u8, lens)

    calls = {"n": 0}

    def fake_enqueue(jobs, nchunks, block_b=None,
                     interpret=False):
        calls["n"] += 1
        if fail_after is not None and calls["n"] > fail_after:
            raise RuntimeError("simulated agent crash on deep enqueue")
        outs = []
        for tables, mode, payload in jobs:
            tile_tab, hap_tab, hoff_tab, hlen_tab = tables
            planes = decode_wire(payload) if mode == "wire" else payload
            q, iq, dq, gq, rdp, hap_u8, lens = planes
            bb = P.vmem_safe_block(
                q.shape[1], block_b or P.GROUP_BLOCK_B)
            nblocks = len(tile_tab)
            pairs = []
            for b in range(nblocks):
                t = int(tile_tab[b])
                hrow = int(hap_tab[b]) * 8 + int(hoff_tab[b])
                hlen = int(hlen_tab[b])
                for r_off in range(bb):
                    r = t * bb + r_off
                    rl = int(lens[r, 0])
                    pairs.append((hap_u8[hrow][:hlen], rdp[r][1:1 + rl],
                                  q[r][1:1 + rl], iq[r][1:1 + rl],
                                  dq[r][1:1 + rl], gq[r][1:1 + rl]))
            vals = pairhmm_forward_native_batch(pairs)
            if vals is None:
                vals = np.array([pairhmm_forward_np(*p) for p in pairs])
            outs.append(np.asarray(vals, np.float64).reshape(-1, 1))
        return outs

    monkeypatch.setattr(P, "enqueue_grouped_jobs", fake_enqueue)
    return calls


def test_pool_device_service_rpc(monkeypatch):
    """Force every worker batch through the parent service (remote routing
    pinned) — results must match the serial host path exactly.  The
    device seam is replaced by a host decoder of the shipped jobs (see
    _fake_device), so the full worker-pack -> RPC -> decode -> compute ->
    flat-reply -> out_pos-map -> checked-validate chain runs end to end."""
    monkeypatch.setenv("LORIKEET_REMOTE_ROUTE", "remote")
    import lorikeet_tpu.calling.likelihoods as L

    class _AllWarm(set):
        def __contains__(self, item):
            return True

    _fake_device(monkeypatch)
    monkeypatch.setattr(L, "_PALLAS_WARM_BUCKETS", _AllWarm())
    L.DISPATCH_COUNTS["device"] = 0
    with tempfile.TemporaryDirectory() as tmp:
        fasta, bams, truth = _dataset(tmp, kbp=80)
        cfg = CallerConfig(use_pallas=False, threads=2)
        fr = FastaReader(fasta)
        readers = [open_bam(p) for p in bams]
        serial = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg))
        pool = pool_mod.get_pool(fasta, bams, cfg, 2, device_service=True)
        pooled = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg), pool=pool)
        assert _key(pooled.calls) == _key(serial.calls)
        assert L.DISPATCH_COUNTS["device"] > 0   # service really dispatched


def test_service_inflight_probe(monkeypatch):
    """The device service probes pipeline depth once after its first clean
    batch: two same-shape job enqueues without readback.  Success raises
    the in-flight limit to 2 (recorded in PROBED_INFLIGHT)."""
    monkeypatch.setenv("LORIKEET_REMOTE_ROUTE", "remote")
    import lorikeet_tpu.calling.likelihoods as L

    class _AllWarm(set):
        def __contains__(self, item):
            return True

    _fake_device(monkeypatch)
    monkeypatch.setattr(L, "_PALLAS_WARM_BUCKETS", _AllWarm())
    with tempfile.TemporaryDirectory() as tmp:
        fasta, bams, truth = _dataset(tmp, kbp=80)
        cfg = CallerConfig(use_pallas=False, threads=2)
        fr = FastaReader(fasta)
        readers = [open_bam(p) for p in bams]
        serial = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg))
        pool = pool_mod.get_pool(fasta, bams, cfg, 2, device_service=True)
        pooled = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg), pool=pool)
        assert _key(pooled.calls) == _key(serial.calls)
        # the probe runs asynchronously after the first reply: poll
        import time
        for _ in range(400):
            if pool_mod.PROBED_INFLIGHT == 2:
                break
            time.sleep(0.05)
        assert pool_mod.PROBED_INFLIGHT == 2        # probe ran and passed


def test_service_inflight_probe_failure_pins_depth(monkeypatch):
    """A probe failure pins depth 1 and retires the chip; every later
    batch bounces to the worker's local kernel — results stay correct."""
    monkeypatch.setenv("LORIKEET_REMOTE_ROUTE", "remote")
    import lorikeet_tpu.calling.likelihoods as L

    class _AllWarm(set):
        def __contains__(self, item):
            return True

    calls = _fake_device(monkeypatch, fail_after=1)
    monkeypatch.setattr(L, "_PALLAS_WARM_BUCKETS", _AllWarm())
    with tempfile.TemporaryDirectory() as tmp:
        fasta, bams, truth = _dataset(tmp, kbp=80)
        cfg = CallerConfig(use_pallas=False, threads=2)
        fr = FastaReader(fasta)
        readers = [open_bam(p) for p in bams]
        serial = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg))
        pool = pool_mod.get_pool(fasta, bams, cfg, 2, device_service=True)
        pooled = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg), pool=pool)
        assert _key(pooled.calls) == _key(serial.calls)  # bounced local
        import time
        for _ in range(400):                 # wait until the probe has run
            if calls["n"] >= 2:
                break
            time.sleep(0.05)
        time.sleep(0.2)
        assert pool_mod.PROBED_INFLIGHT == 1


def test_pool_survives_worker_kill():
    """Crash tolerance: SIGKILL one worker mid-span — its in-flight task is
    requeued onto the survivor, a replacement is respawned, and the calls
    are identical to the serial path (reference analogue: per-genome
    try/continue, src/processing/lorikeet_engine.rs:100)."""
    import signal
    import threading
    import time

    with tempfile.TemporaryDirectory() as tmp:
        fasta, bams, _ = _dataset(tmp, kbp=300, seed=1)
        cfg = CallerConfig(use_pallas=False, threads=2)
        fr = FastaReader(fasta)
        readers = [open_bam(p) for p in bams]
        serial = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg))
        pool = pool_mod.get_pool(fasta, bams, cfg, 2, device_service=False)
        killed = []

        def killer():
            for _ in range(3000):          # wait for a span to be in flight
                if pool._inflight:
                    wid = next(iter(pool._inflight.values()))
                    time.sleep(0.05)       # clear of queue-lock windows
                    os.kill(pool._wid_proc[wid].pid, signal.SIGKILL)
                    killed.append(wid)
                    return
                time.sleep(0.01)

        t = threading.Thread(target=killer)
        t.start()
        pooled = call_contig(fr, readers, "contig1", cfg,
                             HaplotypeCallerEngine(cfg), pool=pool)
        t.join()
        assert killed, "killer never saw an in-flight span"
        assert _key(pooled.calls) == _key(serial.calls)
        assert pooled.depth_pass_rle == serial.depth_pass_rle
        # capacity restored: the dead worker was replaced
        assert sum(w.is_alive() for w in pool.workers) == 2


def test_worker_error_surfaces():
    with tempfile.TemporaryDirectory() as tmp:
        fasta, bams, _ = _dataset(tmp, kbp=40)
        cfg = CallerConfig(use_pallas=False, threads=1)
        pool = pool_mod.get_pool(fasta, bams, cfg, 1, device_service=False)
        tid = pool.submit("no_such_contig", (0, 1000, 0, 1000))
        with pytest.raises(RuntimeError, match="span worker failed"):
            pool.gather([tid])
