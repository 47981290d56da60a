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


def soak_genotype(args):
    """Genotype-mode (strain layer) soak: full end-to-end genotype run —
    calling spine under the -t pool, then clustering, read linkage, EM
    abundance, strain FASTAs — on a 2 Mbp x 4-sample 2-strain mixture
    (~6.6k variants; lorikeet_engine.rs:538-757).  Records wall, RSS and
    strains-exactness.  Dataset is cached under /tmp (generation costs
    minutes; the soak must be repeatable)."""
    import pickle
    import tempfile

    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.processing import start_engine
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    L = args.kbp * 1000
    cdir = os.path.join(tempfile.gettempdir(), "lorikeet_ds_cache",
                        f"geno_k{args.kbp}_s{args.samples}_c{args.coverage}")
    done = os.path.join(cdir, ".complete")
    t0 = time.time()
    if not os.path.exists(done):
        os.makedirs(cdir, exist_ok=True)
        rng = np.random.default_rng(31)
        bases = np.frombuffer(b"ACGT", np.uint8)
        ref = bases[rng.integers(0, 4, L)]
        with open(os.path.join(cdir, "g.fna"), "w") as fh:
            fh.write(">gsoak~c1\n")
            s = ref.tobytes().decode()
            for i in range(0, L, 80):
                fh.write(s[i:i + 80] + "\n")

        def mkstrain(off):
            return [Variant(p, bytes(ref[p:p + 1]),
                            b"T" if bytes(ref[p:p + 1]) != b"T" else b"G")
                    for p in range(1000 + off, L - 1000, 600)]

        strains = [mkstrain(0), mkstrain(300)]
        n_mix = max(args.samples, 2)
        mix = [[1.0, 0.0], [0.0, 1.0]] + [
            [f, 1.0 - f] for f in np.linspace(0.25, 0.75, n_mix - 2)]
        for sidx, fracs in enumerate(mix[:n_mix]):
            recs = []
            for k, (st, fr) in enumerate(zip(strains, fracs)):
                if fr <= 0:
                    continue
                recs += simulate_reads(ref, st, coverage=args.coverage * fr,
                                       seed=900 * sidx + k,
                                       name_prefix=f"g{sidx}_{k}_")
            recs.sort(key=lambda r: (r.tid, r.pos))
            write_bam(os.path.join(cdir, f"s{sidx}.bam"), ["gsoak~c1"], [L],
                      recs)
        with open(os.path.join(cdir, "truth.pkl"), "wb") as fh:
            pickle.dump([set(v.pos for v in st) for st in strains], fh)
        with open(done, "w") as fh:
            fh.write("ok")
    with open(os.path.join(cdir, "truth.pkl"), "rb") as fh:
        truth_sets = pickle.load(fh)
    fasta = os.path.join(cdir, "g.fna")
    bam_paths = [os.path.join(cdir, f"s{k}.bam")
                 for k in range(args.samples)]
    print(f"# genotype dataset ready in {time.time()-t0:.0f}s",
          file=sys.stderr)

    out = "/tmp/lorikeet_soak_geno_out"
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    cfg = CallerConfig(use_pallas=False, threads=args.threads,
                       qual_by_depth_filter=8.0)
    t0 = time.time()
    start_engine("genotype", [fasta], bam_paths, out, cfg)
    wall = time.time() - t0

    from lorikeet_tpu.parallel.pool import shutdown_pool
    shutdown_pool()
    rss_self = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    rss_child = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
    by_strain = {}
    n_rec = 0
    for line in open(os.path.join(out, "gsoak", "gsoak.vcf")):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        n_rec += 1
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        st = info.get("ST")
        if st is not None:
            for sid in st.split(","):
                by_strain.setdefault(sid, set()).add(int(f[1]) - 1)
    exact = (len(by_strain) == len(truth_sets)
             and sorted(map(sorted, by_strain.values()))
             == sorted(map(sorted, truth_sets)))
    strain_fastas = [p for p in os.listdir(os.path.join(out, "gsoak"))
                     if p.endswith(".fna")]
    row = dict(metric="soak_genotype_wall_s", value=round(wall, 1),
               unit="s", kbp=args.kbp, samples=args.samples,
               coverage=args.coverage, threads=args.threads,
               n_vcf_records=n_rec, n_strains=len(by_strain),
               strains_exact=bool(exact),
               n_strain_fastas=len(strain_fastas),
               peak_rss_parent_mb=round(rss_self, 1),
               peak_rss_worker_mb=round(rss_child, 1))
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["call", "genotype"], default="call")
    ap.add_argument("--kbp", type=int, default=10_000)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--eager", action="store_true",
                    help="eager whole-file decode instead of streaming")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.mode == "genotype":
        row = soak_genotype(args)
        if args.json:
            with open(args.json, "w") as fh:
                json.dump(row, fh, indent=1)
        return

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
