"""Streaming-reader memory proof (VERDICT r2 item 8): peak RSS of a 250 kb
window call against a multi-hundred-MB BAM must stay O(window), not O(file).

Generates a large coordinate-sorted BAM with a windowed generator (the
writer streams records, so generation memory is O(window) too), then runs
call_contig over one 250 kb window in a measured SUBPROCESS via the
StreamingBamReader (io/bam.py:576, the reference's IndexedNamedBamReader
role, bam_generator.rs:48) and reports ru_maxrss.  A second subprocess
repeats the call with the eager whole-file decoder for contrast.

Usage: python bench_memory.py [--mbp 12] [--coverage 15]
       python bench_memory.py --worker <bam> <fasta> <mode>   (internal)
Prints one JSON line per mode.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time



def _worker(bam_path: str, fasta_path: str, mode: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import resource

    import numpy as np  # noqa: F401
    from lorikeet_tpu.calling.engine import CallerConfig, HaplotypeCallerEngine
    from lorikeet_tpu.io.bam import open_bam
    from lorikeet_tpu.io.fasta import FastaReader

    from lorikeet_tpu.processing import call_contig
    rdr = open_bam(bam_path, streaming=(mode == "streaming"))
    fr = FastaReader(fasta_path)
    cfg = CallerConfig(use_pallas=False)
    mid = fr.length("contig1") // 2
    window = (mid, mid + 250_000)
    t0 = time.time()
    res = call_contig(fr, [rdr], "contig1", cfg,
                      HaplotypeCallerEngine(cfg), limit=window)
    wall = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(json.dumps(dict(
        metric="window_call_peak_rss_mb", mode=mode,
        value=round(peak_mb, 1), unit="MB", wall_s=round(wall, 2),
        n_calls=len(res.calls),
        bam_mb=round(os.path.getsize(bam_path) / 1e6, 1))))


def _gen_bam(tmp: str, mbp: int, coverage: float):
    import numpy as np
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    L = mbp * 1_000_000
    rng = np.random.default_rng(5)
    # reference written window-by-window; kept for the caller via fasta
    fasta = os.path.join(tmp, "genome.fna")
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, L)].copy()
    with open(fasta, "w") as fh:
        fh.write(">contig1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    win = 500_000

    def gen():
        for lo in range(0, L, win):
            hi = min(L, lo + win)
            sub = ref[lo:hi]
            vs = [Variant(int(p), bytes(sub[p:p + 1]),
                          b"T" if sub[p] != ord("T") else b"A")
                  for p in range(25_000, hi - lo - 1000, 50_000)]
            recs = simulate_reads(sub, vs, coverage=coverage,
                                  seed=lo, allele_fraction=0.5,
                                  name_prefix=f"w{lo}_")
            recs.sort(key=lambda r: (r.tid, r.pos))
            for r in recs:
                # shift window-relative coordinates to contig space
                r.pos += lo
                if r.mate_pos >= 0:
                    r.mate_pos += lo
                yield r

    bam = os.path.join(tmp, "big.bam")
    write_bam(bam, ["contig1"], [L], gen())
    return fasta, bam


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=12)
    ap.add_argument("--coverage", type=float, default=15.0)
    ap.add_argument("--skip-eager", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="lorikeet_mem_")
    t0 = time.time()
    fasta, bam = _gen_bam(tmp, args.mbp, args.coverage)
    print(f"# generated {os.path.getsize(bam)/1e6:.0f} MB BAM in "
          f"{time.time()-t0:.0f}s", file=sys.stderr)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    modes = ["streaming"] if args.skip_eager else ["streaming", "eager"]
    for mode in modes:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             bam, fasta, mode], env=env, check=True)


if __name__ == "__main__":
    main()
