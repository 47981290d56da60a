"""Scale soak: 10 Mbp x 8 samples x 30x `call` with streaming readers and
the -t worker pool — one order of magnitude beyond the routine benches, to
surface any O(genome) / O(samples^2) surprise before it becomes
architecture (VERDICT r3 item 7; contig->chunk design,
haplotype_caller_engine.rs:417-470).

Records wall, peak RSS (parent + children), active regions/s, recall.

Usage: python bench_soak.py [--kbp 10000] [--samples 8] [--threads 4]
       [--streaming] [--json SOAK_r04.json]
"""
import argparse
import json
import os
import resource
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kbp", type=int, default=10_000)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--eager", action="store_true",
                    help="eager whole-file decode instead of streaming")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from bench_e2e import recall, simulate_dataset
    from lorikeet_tpu.calling.engine import CallerConfig, HaplotypeCallerEngine
    from lorikeet_tpu.io.bam import open_bam
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.io.vcf import write_vcf
    from lorikeet_tpu.processing import _configure_devices, call_contig

    t0 = time.time()
    fasta, bam_paths, truth = simulate_dataset(
        "/tmp", args.kbp, args.samples, args.coverage)
    print(f"# dataset ready ({len(truth)} variants) in {time.time()-t0:.0f}s",
          file=sys.stderr)

    cfg = CallerConfig(use_pallas=False, threads=args.threads)
    _configure_devices(cfg)
    fr = FastaReader(fasta)
    t0 = time.time()
    bams = [open_bam(p, streaming=not args.eager) for p in bam_paths]
    engine = HaplotypeCallerEngine(cfg)
    pool = None
    if args.threads > 1:
        from lorikeet_tpu.parallel.pool import get_pool
        pool = get_pool(fasta, bam_paths, cfg, args.threads,
                        device_service=False)
    res = call_contig(fr, bams, "contig1", cfg, engine, pool=pool)
    calls = res.calls
    for vc in calls:
        vc.tid = 0
    out = "/tmp/lorikeet_soak_out"
    os.makedirs(out, exist_ok=True)
    write_vcf(os.path.join(out, "soak.vcf"), calls, ["contig1"],
              [fr.length("contig1")],
              [f"sample{k}" for k in range(args.samples)])
    wall = time.time() - t0

    # join the pool BEFORE reading rusage: RUSAGE_CHILDREN only counts
    # reaped children, so live daemon workers would report 0
    from lorikeet_tpu.parallel.pool import shutdown_pool
    shutdown_pool()
    rss_self = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    rss_child = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
    row = dict(metric="soak_wall_s", value=round(wall, 1), unit="s",
               kbp=args.kbp, samples=args.samples, coverage=args.coverage,
               threads=args.threads, streaming=not args.eager,
               n_regions=res.n_regions,
               active_regions_per_sec=round(res.n_regions / wall, 1),
               n_calls=len(calls), recall=round(recall(calls, truth), 4),
               peak_rss_parent_mb=round(rss_self, 1),
               peak_rss_worker_mb=round(rss_child, 1))
    print(json.dumps(row))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(row, fh, indent=1)


if __name__ == "__main__":
    main()
