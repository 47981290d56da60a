"""Host-path scaling: N CONCURRENT chunk-shard worker processes on one
genome, wall-clock vs the single-process run (the measurement VERDICT r2
found missing: tests prove correctness with sequential simulated processes;
this records real concurrent efficiency on one machine).

The work split is run_genome_sharded's round-robin chunk sharding (SURVEY
§2.4 rows 1-2 — the reference's rayon region fan-out,
assembly_region_walker.rs:139-141, as processes).  On one box the workers
contend for cores, so this is a lower bound on multi-host efficiency where
each process owns a machine.

Usage: python bench_scaling_host.py [--kbp 1000] [--samples 2] [--procs 1 2 4]
       python bench_scaling_host.py --worker <idx> <count> <tmpdir> <outdir>
Prints one JSON line per N plus a summary line with efficiency vs N=1.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def _worker_main(idx: int, count: int, tmp: str, outdir: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam import open_bam
    from lorikeet_tpu.processing import discover_genomes, run_genome_sharded

    fasta = os.path.join(tmp, "genome.fna")
    spec = discover_genomes([fasta])[0]
    bam_paths = sorted(
        os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(".bam"))
    bams = [open_bam(p) for p in bam_paths]
    cfg = CallerConfig(use_pallas=False)
    out = run_genome_sharded(
        spec, bams, outdir, cfg,
        [f"sample{k}" for k in range(len(bams))],
        process_index=idx, process_count=count)
    if idx == 0:
        assert out.get("vcf"), out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker_main(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                     sys.argv[5])
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--kbp", type=int, default=1000)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--mode", choices=["pool", "shards", "both"],
                    default="pool",
                    help="pool = the production -t path (persistent span-"
                         "worker pool, startup amortized across chunks/"
                         "genomes); shards = independent sharded processes "
                         "(multi-host simulation: each pays its own "
                         "interpreter+decode startup inside the window)")
    ap.add_argument("--repeats", type=int, default=2,
                    help="min-wall over N passes per row (pool mode; the "
                         "wall-noise protocol)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from bench_e2e import simulate_dataset
    tmp = tempfile.mkdtemp(prefix="lorikeet_scale_")
    t0 = time.time()
    fasta, bams, truth = simulate_dataset(tmp, args.kbp, args.samples,
                                          args.coverage)
    print(f"# simulated {args.kbp} kb x {args.samples} samples in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    rows = []

    if args.mode in ("pool", "both"):
        # the production -t path: persistent span-worker pool, one spawn
        # per row amortized over `repeats` passes (the steady state a real
        # run lives in after its first chunk wave)
        from bench_e2e import run_once
        base_wall = None
        for n in args.procs:
            walls = []
            for _ in range(max(args.repeats, 1)):
                wall, n_regions, calls, _ = run_once(
                    fasta, bams, os.path.join(tmp, f"pool_n{n}"),
                    use_pallas=False, threads=n)
                walls.append(wall)
            wall = min(walls)
            row = dict(metric="host_scaling_wall_s", mode="pool",
                       n_workers=n, value=round(wall, 2), unit="s",
                       spread=round((max(walls) - min(walls)) / min(walls),
                                    3))
            if base_wall is None:
                base_wall = wall
            else:
                row["speedup"] = round(base_wall / wall, 3)
                row["efficiency"] = round(base_wall / wall / n, 3)
            rows.append(row)
            print(json.dumps(row))
        from lorikeet_tpu.parallel.pool import shutdown_pool
        shutdown_pool()

    if args.mode in ("shards", "both"):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   LORIKEET_SHARD_GRACE="600")
        base_wall = None
        for n in args.procs:
            outdir = os.path.join(tmp, f"out_n{n}")
            t0 = time.time()
            procs = [subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(i), str(n), tmp, outdir],
                env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
                for i in range(n)]
            rcs = [p.wait() for p in procs]
            wall = time.time() - t0
            assert all(rc == 0 for rc in rcs), rcs
            row = dict(metric="host_scaling_wall_s", mode="shards",
                       n_processes=n, value=round(wall, 2), unit="s")
            if base_wall is None:
                base_wall = wall
            else:
                row["speedup"] = round(base_wall / wall, 3)
                row["efficiency"] = round(base_wall / wall / n, 3)
            rows.append(row)
            print(json.dumps(row))

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
