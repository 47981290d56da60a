"""End-to-end `call` benchmark: host pair-HMM vs TPU-dispatched pair-HMM.

Simulates a genome with planted variants, writes a real BAM, and runs the
full production pipeline (activity profile -> assembly -> pair-HMM ->
genotyping -> VCF) twice: once with the exact f64 host kernel
(use_pallas=False) and once with device dispatch (eager-prewarm routing).
Reports wall time, active regions/sec, recall, and the per-stage split.

This is the benchmark the reference's hot loop lives under: the GKL
pair-HMM (/root/reference/src/pair_hmm/pair_hmm.rs:345-375) inside the full
call_region spine (haplotype_caller_engine.rs:1162-1448).

Usage:  python bench_e2e.py [--kbp 2000] [--samples 4] [--coverage 30]
        [--skip-host] [--json out.json]
Prints one JSON line per configuration plus a summary line.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def simulate_dataset(tmp, kbp: int, n_samples: int, coverage: float,
                     seed: int = 0, cache: bool = True):
    """A single-contig genome of `kbp` kilobases with ~1 variant / 2 kb,
    written as FASTA + one BAM per sample.  Returns (fasta, bams, truth).

    Generation is deterministic in (kbp, samples, coverage, seed), so the
    artifacts are cached under /tmp — a 2 Mbp x 2 simulation costs ~250 s
    and repeat benchmarking must not pay it per invocation."""
    import pickle
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    if cache:
        cdir = os.path.join(tempfile.gettempdir(), "lorikeet_ds_cache",
                            f"k{kbp}_s{n_samples}_c{coverage}_r{seed}")
        done = os.path.join(cdir, ".complete")
        if os.path.exists(done):
            with open(os.path.join(cdir, "truth.pkl"), "rb") as fh:
                truth = pickle.load(fh)
            return (os.path.join(cdir, "genome.fna"),
                    [os.path.join(cdir, f"sample{s}.bam")
                     for s in range(n_samples)], truth)
        os.makedirs(cdir, exist_ok=True)
        fasta_out, bams_out, truth = simulate_dataset(
            cdir, kbp, n_samples, coverage, seed, cache=False)
        with open(os.path.join(cdir, "truth.pkl"), "wb") as fh:
            pickle.dump(truth, fh)
        with open(done, "w") as fh:
            fh.write("ok")
        return fasta_out, bams_out, truth

    rng = np.random.default_rng(seed)
    L = kbp * 1000
    ref = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, L)].copy()
    fasta = os.path.join(tmp, "genome.fna")
    with open(fasta, "w") as fh:
        fh.write(">contig1\n")
        seq = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(seq[i:i + 80] + "\n")

    variants = []
    pos = 1000
    while pos < L - 1500:
        r = rng.random()
        if r < 0.7:                                           # SNP
            ref_idx = b"ACGT".index(ref[pos])
            alt = b"ACGT"[(ref_idx + 1 + int(rng.integers(0, 3))) % 4]
            variants.append(Variant(pos, bytes(ref[pos:pos + 1]),
                                    bytes([alt])))
        elif r < 0.85:                                        # 1-6bp del
            n = int(rng.integers(1, 7))
            variants.append(Variant(pos, bytes(ref[pos:pos + n + 1]),
                                    bytes(ref[pos:pos + 1])))
        else:                                                 # 1-6bp ins
            n = int(rng.integers(1, 7))
            ins = bytes(np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, n)])
            variants.append(Variant(pos, bytes(ref[pos:pos + 1]),
                                    bytes(ref[pos:pos + 1]) + ins))
        pos += int(rng.integers(1500, 2500))

    bams = [os.path.join(tmp, f"sample{s}.bam") for s in range(n_samples)]
    if n_samples >= 4:
        # simulation is per-sample independent — parallelize (a 10 Mbp x 8
        # soak dataset costs >1 h serially)
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(
                min(os.cpu_count() or 4, n_samples),
                mp_context=mp.get_context("spawn")) as pool:
            list(pool.map(_simulate_one_sample,
                          [(fasta, L, variants, coverage, seed, s, bams[s])
                           for s in range(n_samples)]))
    else:
        for s in range(n_samples):
            _simulate_one_sample((fasta, L, variants, coverage, seed, s,
                                  bams[s]))
    return fasta, bams, variants


def _simulate_one_sample(payload):
    fasta, L, variants, coverage, seed, s, bam = payload
    import numpy as _np

    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.testkit.simulate import simulate_reads
    ref = _np.asarray(FastaReader(fasta).fetch("contig1"), _np.uint8)
    recs = simulate_reads(ref, variants, coverage=coverage,
                          seed=seed + 101 * s, allele_fraction=0.5,
                          error_rate=0.001, sample=f"sample{s}")
    write_bam(bam, ["contig1"], [L],
              sorted(recs, key=lambda r: (r.tid, r.pos)),
              header_text=None)


def run_once(fasta, bam_paths, outdir, use_pallas, threads: int = 1):
    """One full `call` run; returns (wall_s, n_regions, n_calls, timings)."""
    from lorikeet_tpu.calling.engine import CallerConfig, HaplotypeCallerEngine
    from lorikeet_tpu.io.bam import open_bam
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.io.vcf import write_vcf
    from lorikeet_tpu.processing import _configure_devices, call_contig

    cfg = CallerConfig(use_pallas=use_pallas, threads=threads)
    _configure_devices(cfg)
    from lorikeet_tpu.utils import progress as _prog
    _prog.GLOBAL_STAGES = {}
    fr = FastaReader(fasta)
    t0 = time.time()
    bams = [open_bam(p) for p in bam_paths]
    engine = HaplotypeCallerEngine(cfg)
    # -t maps to the persistent span-worker pool (parallel.pool): CPU
    # workers prep+genotype spans; with use_pallas the parent's chip
    # serves their pair-HMM batches through the device service
    pool = None
    if threads > 1:
        import jax

        from lorikeet_tpu.parallel.pool import get_pool
        dev = bool(use_pallas) and jax.default_backend() != "cpu"
        pool = get_pool(fasta, bam_paths, cfg, threads, device_service=dev)
    res = call_contig(fr, bams, "contig1", cfg, engine, pool=pool)
    calls = res.calls
    for vc in calls:
        vc.tid = 0
    vcf = os.path.join(outdir, "out.vcf")
    os.makedirs(outdir, exist_ok=True)
    write_vcf(vcf, calls, ["contig1"], [fr.length("contig1")],
              [f"sample{k}" for k in range(len(bam_paths))])
    wall = time.time() - t0
    stages = {k: round(v, 2) for k, v in _prog.GLOBAL_STAGES.items()}
    from lorikeet_tpu.calling import likelihoods as _lk
    stages["dispatches"] = dict(_lk.DISPATCH_COUNTS)
    _lk.DISPATCH_COUNTS.update(device=0, host=0)
    _prog.GLOBAL_STAGES = None
    print(f"# stages[{'tpu' if use_pallas else 'host'}]: "
          f"{json.dumps(stages)}", file=sys.stderr)
    return wall, res.n_regions, calls, vcf


def recall(calls, truth) -> float:
    called = {c.start for c in calls}
    hit = 0
    for t in truth:
        if t.pos in called:
            hit += 1
        elif len(t.ref) != len(t.alt):
            # indels may left-align a few bases upstream in the VCF
            if any(p in called for p in range(t.pos - 25, t.pos)):
                hit += 1
    return hit / max(len(truth), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kbp", type=int, default=2000)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=1,
                    help="run each timed leg N times and keep the "
                         "min-wall pass (quiet-machine estimator, same "
                         "policy as the kernel bench)")
    ap.add_argument("--best-threads", type=int, default=0,
                    help="also run host/tpu legs at this -t (the host's "
                         "best configuration on this box); adds host_best/"
                         "tpu_best rows")
    ap.add_argument("--paired", type=int, default=0, metavar="MAX_PAIRS",
                    help="measure host-vs-tpu speedups with interleaved "
                         "A/B/A/B passes: each ratio shares one load "
                         "environment, the speedup is the median of paired "
                         "ratios, and sampling continues until the middle "
                         "ratios agree within 15%% (drifting box load can "
                         "no longer fake a win OR a loss)")
    ap.add_argument("--skip-host", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--prewarm-first", action="store_true",
                    help="start the bucket compiles before the host leg "
                         "(models a long-lived process whose buckets are "
                         "warm; without it the TPU leg pays/overlaps its "
                         "own compiles via the routing fallback)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    if args.prewarm_first and jax.default_backend() != "cpu":
        from lorikeet_tpu.calling.likelihoods import prewarm_pallas_buckets
        prewarm_pallas_buckets()
        # the timed legs must not race the background compiles: in-flight
        # Mosaic compiles contend for the GIL/tunnel and slow HOST stages
        # 3-4x (measured).  Settle before timing (models the steady state
        # of a long-lived server process).
        import lorikeet_tpu.calling.likelihoods as _L

        def _settle():
            import time as _t
            deadline = _t.time() + 900
            while _t.time() < deadline and (
                    _L._prewarm_queue or _L._prewarm_threads):
                _t.sleep(1.0)
        _settle_fn = _settle
    else:
        _settle_fn = lambda: None
    tmp = tempfile.mkdtemp(prefix="lorikeet_e2e_")
    t0 = time.time()
    fasta, bams, truth = simulate_dataset(tmp, args.kbp, args.samples,
                                          args.coverage)
    print(f"# simulated {args.kbp} kb x {args.samples} samples x "
          f"{args.coverage}x ({len(truth)} variants) in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    _settle_fn()
    rows = []

    def leg(config, use_pallas, threads, outdir):
        """One timed leg at `repeats` passes: min wall (quiet-machine
        estimator) + the min/median/spread the wall-noise protocol
        requires — no more single-pass verdicts."""
        runs = [run_once(fasta, bams, os.path.join(tmp, outdir),
                         use_pallas=use_pallas, threads=threads)
                for _ in range(max(args.repeats, 1))]
        walls = sorted(r[0] for r in runs)
        wall, n_regions, calls, _ = min(runs, key=lambda r: r[0])
        row = dict(metric="e2e_wall_s", config=config,
                   value=round(wall, 2), unit="s", threads=threads,
                   wall_median=round(walls[len(walls) // 2], 2),
                   spread=round((walls[-1] - walls[0]) / walls[0], 3),
                   active_regions_per_sec=round(n_regions / wall, 1),
                   n_regions=n_regions,
                   recall=round(recall(calls, truth), 4))
        rows.append(row)
        print(json.dumps(row))
        return row

    def paired_race(config, threads, outdir, max_pairs, tol=0.15):
        """Interleaved A/B wall-clock race at one -t: host-kernel pass then
        device-routed pass, back to back, repeated.  Each pair shares one
        load environment, so the per-pair ratio host/tpu is robust to the
        box-load drift that put e2e_spread at 4.3 in the round-4 capture
        (host legs all ran before tpu legs there).  The speedup estimate is
        the MEDIAN of paired ratios; sampling continues until the middle
        three ratios agree within `tol` (or max_pairs)."""
        host_w, tpu_w, ratios = [], [], []
        keep = None
        while True:
            h = run_once(fasta, bams, os.path.join(tmp, outdir + "_h"),
                         use_pallas=False, threads=threads)
            t = run_once(fasta, bams, os.path.join(tmp, outdir + "_t"),
                         use_pallas=True, threads=threads)
            keep = keep or t
            host_w.append(h[0])
            tpu_w.append(t[0])
            ratios.append(h[0] / t[0])
            if len(ratios) >= 3:
                mid = sorted(ratios)[max(0, (len(ratios) - 3) // 2):][:3]
                if (mid[-1] - mid[0]) / mid[0] <= tol:
                    break
            if len(ratios) >= max_pairs:
                break
        s = sorted(ratios)
        median_ratio = s[(len(s) - 1) // 2]          # lower-middle: no
        mid = s[max(0, (len(s) - 3) // 2):][:3]      # averaged optimism
        _, n_regions, calls, _ = keep
        row = dict(metric="e2e_paired_speedup", config=config,
                   value=round(median_ratio, 3), unit="x(host/tpu)",
                   threads=threads, n_pairs=len(ratios),
                   paired_spread=round((mid[-1] - mid[0]) / mid[0], 3),
                   ratios=[round(r, 3) for r in ratios],
                   host_wall_min=round(min(host_w), 2),
                   tpu_wall_min=round(min(tpu_w), 2),
                   host_wall_median=round(sorted(host_w)[len(host_w) // 2], 2),
                   tpu_wall_median=round(sorted(tpu_w)[len(tpu_w) // 2], 2),
                   recall=round(recall(calls, truth), 4))
        rows.append(row)
        print(json.dumps(row))
        return row

    host = tpu = None
    on_tpu = jax.default_backend() != "cpu"
    if not args.skip_host:
        host = leg("host_kernel", False, args.threads, "host")
    if not args.skip_tpu and on_tpu:
        tpu = leg("tpu_dispatch", True, args.threads, "tpu")
        if host:
            tpu["speedup_vs_host"] = round(host["value"] / tpu["value"], 3)
            print(json.dumps(tpu))
        if args.paired and host:
            paired_race("paired_t", args.threads, "pair", args.paired)
    if args.best_threads and args.best_threads != args.threads:
        # the honest comparison: the reference is a multithreaded rayon
        # tool (src/bin/lorikeet.rs:29-32), so "beats host" must mean
        # beats the host path at its best -t, with the TPU-routed config
        # (pool workers + parent device service) at the same -t
        host_best = None
        if not args.skip_host:
            host_best = leg("host_best", False, args.best_threads,
                            "host_best")
        if not args.skip_tpu and on_tpu:
            tpu_best = leg("tpu_best", True, args.best_threads, "tpu_best")
            if host_best:
                tpu_best["speedup_vs_best_host"] = round(
                    host_best["value"] / tpu_best["value"], 3)
                print(json.dumps(tpu_best))
            if args.paired and host_best:
                paired_race("paired_best", args.best_threads, "pair_best",
                            args.paired)

    from lorikeet_tpu.parallel import pool as pool_mod
    if pool_mod.PROBED_INFLIGHT:
        row = dict(metric="service_inflight",
                   value=pool_mod.PROBED_INFLIGHT, unit="batches",
                   config="probe")
        rows.append(row)
        print(json.dumps(row))

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
