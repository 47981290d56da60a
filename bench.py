"""Benchmark: pair-HMM throughput + end-to-end call wall on one chip.

Prints ONE final JSON line:
  {"metric": "pairhmm_forward_gcups", "value": N, "unit": "GCUPS/chip",
   "vs_baseline": N, "pairhmm_effective_gcups": N, "active_regions_per_sec":
   N, "e2e_wall_s": N, "e2e_host_wall_s": N, "sharded_1dev_ok": bool, ...}

Baseline: the reference's Intel GKL AVX-512 pair-HMM forward
(/root/reference/src/pair_hmm/pair_hmm.rs:345-375).  Published GKL f64
AVX-512 throughput is ~1-3 GCUPS single-threaded; we use 3.0 GCUPS as a
generous single-chip-vs-single-socket baseline (BASELINE.md: target >=10x).

Sections:
 1. peak kernel GCUPS — uniform 8192 x 127 x 256 batch, pack once, enqueue
    N, read back once (the tunnel's ~27 ms D2H is amortized; best-of-3
    min-time strips tunnel-load noise).
 2. effective (ragged) GCUPS — a realistic read/hap length mixture pushed
    through the PRODUCTION routing path (compute_pair_likelihoods:
    lane-fit bucketing, slab packing, f32->f64 escalation checks); value
    counts TRUE cells only, so padding waste is priced in.
 3. compiled shard_map lowering on a 1-device mesh (force path) — golden
    agreement vs the unsharded kernel.
 4. end-to-end `call` (1 Mbp x 2 samples x 30x simulated): host-kernel wall
    vs TPU-dispatch wall + active regions/sec (BASELINE.json metric).

Skip slow sections with LORIKEET_BENCH_FAST=1 (kernel-only).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_GCUPS = 3.0


def _mk_uniform(B=8192, R=127, H=256):
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = bases[rng.integers(0, 4, (B, H))]
    reads = np.ascontiguousarray(haps[:, :R])
    return dict(
        haps=haps, hap_lens=np.full(B, H, np.int32),
        reads=reads, read_lens=np.full(B, R, np.int32),
        quals=np.full((B, R), 30, np.uint8),
        ins_quals=np.full((B, R), 45, np.uint8),
        del_quals=np.full((B, R), 45, np.uint8),
        gcps=np.full((B, R), 10, np.uint8),
    )


def bench_kernel_peak():
    from lorikeet_tpu.ops.pairhmm_pallas import (
        pack_pallas_inputs, pairhmm_forward_packed,
    )
    # block_b=128: measured 54.4 GCUPS vs 52 at block 256, and the Mosaic
    # compile drops from ~20 min to seconds (block 256 compile time is the
    # dominant cost of this whole benchmark)
    B, R, H = 8192, 127, 256
    big = _mk_uniform(B, R, H)
    operands, nchunks, _ = pack_pallas_inputs(**big, block_b=128)
    np.asarray(pairhmm_forward_packed(operands, nchunks, B, 128))  # compile

    def run_n(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = pairhmm_forward_packed(operands, nchunks, B, 128)
        np.asarray(out)
        return time.time() - t0

    def best3_spread(samples):
        b = sorted(samples)[:3]
        return (b[-1] - b[0]) / b[0] if len(b) >= 3 else 1.0

    def measure():
        """Load-robust estimator: keep sampling until the three best
        passes agree within 10% (min-of-fixed-5 lost to SUSTAINED tunnel
        load in the round-3 driver capture: 23 GCUPS recorded on a kernel
        that measures 54+ — the estimator, not the kernel, was the bug)."""
        t1 = min(run_n(1) for _ in range(2))
        samples = [(run_n(21) - t1) / 20 for _ in range(3)]
        while best3_spread(samples) > 0.10 and len(samples) < 12:
            samples.append((run_n(21) - t1) / 20)
        return min(samples), best3_spread(samples), len(samples)

    per_call, spread, passes = measure()
    if spread > 0.15:
        # one full-section retry before accepting a noisy record
        per_call2, spread2, passes2 = measure()
        if per_call2 < per_call:
            per_call, spread, passes = per_call2, spread2, passes + passes2
    return B * R * H / per_call / 1e9, spread, passes


def bench_effective_ragged():
    """Realistic mixture through the production dispatch path."""
    import lorikeet_tpu.calling.likelihoods as L

    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def mk_region_pairs(n_regions, reads_per, haps_per, rlens, hlens):
        """Region-structured batches exactly as production produces them:
        each region's reads (mutated windows of its base hap) cross ALL of
        its haplotypes, with read/hap arrays SHARED across the cross
        product (the structure the grouped dispatch dedups).  Unrelated
        random sequences would underflow f32 and escalate every pair to
        the host recompute; per-pair unique haps would defeat grouping."""
        pairs = []
        for _ in range(n_regions):
            H = int(rng.choice(hlens))
            base_hap = bases[rng.integers(0, 4, H)]
            haps = [base_hap]
            for _ in range(haps_per - 1):
                h = base_hap.copy()
                h[int(rng.integers(0, H))] = bases[int(rng.integers(0, 4))]
                haps.append(h)
            for _ in range(reads_per):
                R = min(int(rng.choice(rlens)), H - 1)
                lo = int(rng.integers(0, H - R))
                read = base_hap[lo:lo + R].copy()
                for _ in range(int(rng.integers(0, 4))):
                    read[int(rng.integers(0, R))] = bases[
                        int(rng.integers(0, 4))]
                q = np.full(R, 30, np.uint8)
                row = (read, q, np.full(R, 45, np.uint8),
                       np.full(R, 45, np.uint8), np.full(R, 10, np.uint8))
                for h in haps:
                    pairs.append((h,) + row)
        return pairs

    # span batches as production sees them: ~4-8 regions x ~150-400 reads
    # x 4-6 haplotypes; short reads 70-151bp, trimmed haps 150-450bp
    batches = [mk_region_pairs(int(rng.integers(4, 9)),
                               int(rng.integers(150, 400)),
                               int(rng.integers(4, 7)),
                               range(70, 152), range(180, 451))
               for _ in range(6)]
    # warm every bucket these batches hit (production prewarm does this)
    # and pin the router to the DEVICE side — this row measures the device
    # round-trip, not whichever side the adaptive router would pick
    old_mode = L._ROUTE_MODE
    L._ROUTE_MODE = "device"
    try:
        for b in batches:
            L._PALLAS_WARM_BUCKETS.add(L._pallas_bucket(b))
            L.compute_pair_likelihoods(b, use_pallas=True)
        true_cells = sum(len(p[0]) * len(p[1]) for b in batches for p in b)
        t0 = time.time()
        for b in batches:
            L.compute_pair_likelihoods(b, use_pallas=True)
        wall = time.time() - t0
        # async variant: one batch stays in flight while the next is
        # packed+enqueued (the span pipeline / device-service overlap);
        # readback of batch N is deferred until N+1 has been dispatched.
        # Depth stays at 2 — deeper same-shape queues are routine (the
        # kernel-peak bench enqueues 21) but the tunneled agent has
        # crashed under deeper mixed-shape pipelines.
        from lorikeet_tpu.ops.pairhmm import pairhmm_forward_checked
        from lorikeet_tpu.ops.pairhmm_pallas import pairhmm_forward_grouped
        t0 = time.time()
        inflight = []
        for b in batches:
            inflight.append((pairhmm_forward_grouped(b), b))
            while len(inflight) >= 2:
                raw, bb = inflight.pop(0)
                pairhmm_forward_checked(np.asarray(raw), bb)
        for raw, bb in inflight:
            pairhmm_forward_checked(np.asarray(raw), bb)
        wall_async = time.time() - t0
    finally:
        L._ROUTE_MODE = old_mode
    return true_cells / wall / 1e9, true_cells / wall_async / 1e9


def bench_sharded_1dev():
    """Mosaic-under-shard_map on the real chip via the force path."""
    import jax
    from lorikeet_tpu.ops.pairhmm_pallas import (
        pack_pallas_inputs, pairhmm_forward_packed, pairhmm_forward_sharded,
    )
    from lorikeet_tpu.parallel.sharding import make_mesh
    B, R, H = 1024, 95, 160
    ops_np, nchunks, _ = pack_pallas_inputs(**_mk_uniform(B, R, H),
                                            to_device=False)
    mesh = make_mesh(np.array(jax.devices()[:1]))
    sharded = np.asarray(pairhmm_forward_sharded(
        ops_np, nchunks, B, mesh, force=True))
    ops_dev, nchunks, _ = pack_pallas_inputs(**_mk_uniform(B, R, H))
    plain = np.asarray(pairhmm_forward_packed(ops_dev, nchunks, B))
    return bool(np.allclose(sharded, plain, atol=1e-5, rtol=1e-5))


def bench_e2e():
    import subprocess
    best_t = min(os.cpu_count() or 4, 4)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "bench_e2e.py"),
         "--kbp", "1000", "--samples", "2", "--prewarm-first",
         "--repeats", "2", "--best-threads", str(best_t),
         "--paired", "8"],
        capture_output=True, text=True, timeout=3300)
    rows = {}
    for line in out.stdout.splitlines():
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "config" in row:
            rows[row["config"]] = row
    return rows


def bench_genotype():
    """Genotype-mode (strain layer) wall + exactness: clustering ->
    linkage -> EM abundance -> ANI on a 100 kb x 4-sample 2-strain
    mixture (lorikeet_engine.rs:538-757; the layer GATK doesn't have)."""
    import tempfile

    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.processing import start_engine
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    rng = np.random.default_rng(17)
    L = 100_000
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, L)]
    tmp = tempfile.mkdtemp(prefix="lorikeet_geno_bench_")
    fasta = os.path.join(tmp, "g.fna")
    with open(fasta, "w") as fh:
        fh.write(">gbench~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    def mkstrain(seed, n=40):
        r = np.random.default_rng(seed)
        pos = np.sort(r.choice(np.arange(500, L - 500), n, replace=False))
        out = []
        for p in pos:
            refb = bytes(ref[p:p + 1])
            out.append(Variant(int(p), refb,
                               b"T" if refb != b"T" else b"G"))
        return out

    strains = [mkstrain(41), mkstrain(42)]
    mix = [[1.0, 0.0], [0.0, 1.0], [0.65, 0.35], [0.25, 0.75]]
    bam_paths = []
    for sidx, fracs in enumerate(mix):
        recs = []
        for k, (st, fr) in enumerate(zip(strains, fracs)):
            if fr <= 0:
                continue
            recs += simulate_reads(ref, st, coverage=30 * fr,
                                   seed=500 * sidx + k,
                                   name_prefix=f"g{sidx}_{k}_")
        recs.sort(key=lambda r: (r.tid, r.pos))
        path = os.path.join(tmp, f"s{sidx}.bam")
        write_bam(path, ["gbench~c1"], [L], recs)
        bam_paths.append(path)

    cfg = CallerConfig(use_pallas=False, threads=1,
                       qual_by_depth_filter=8.0)
    t0 = time.time()
    start_engine("genotype", [fasta], bam_paths,
                 os.path.join(tmp, "out"), cfg)
    wall = time.time() - t0
    # strain recovery: at this variant spacing (2.5 kb >> fragment size)
    # read linkage cannot merge clusters, so strains legitimately resolve
    # as multiple VG groups (the reference's physics too).  The correctness
    # bar is PURITY (no group mixes strains) + COMPLETENESS (every planted
    # variant called and grouped).
    truth_sets = [set(v.pos for v in st) for st in strains]
    groups = {}
    vcf = os.path.join(tmp, "out", "gbench", "gbench.vcf")
    for line in open(vcf):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        vg = info.get("VG")
        if vg is not None:
            groups.setdefault(vg, set()).add(int(f[1]) - 1)
    pure = all(
        any(g <= t for t in truth_sets) for g in groups.values())
    grouped = set().union(*groups.values()) if groups else set()
    complete = all(t <= grouped for t in truth_sets)
    return wall, pure and complete and len(groups) >= len(strains)


def bench_genotype_linked():
    """Strains-EXACT genotype bench: variant spacing (200 bp) inside the
    simulated fragment length (300 +/- 30), so paired fragments span
    adjacent same-strain variants and read linkage
    (linkage_engine.rs:73-170,889-1040) can merge clusters into whole
    strains — the path the 2.5 kb-spaced dataset physically cannot
    exercise.  Returns (wall_s, strains_exact, n_vg_groups, n_strains)."""
    import tempfile

    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.processing import start_engine
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    rng = np.random.default_rng(23)
    L = 40_000
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, L)]
    tmp = tempfile.mkdtemp(prefix="lorikeet_geno_linked_")
    fasta = os.path.join(tmp, "g.fna")
    with open(fasta, "w") as fh:
        fh.write(">glink~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    def mkstrain(offset):
        out = []
        for p in range(1000 + offset, L - 1000, 240):
            refb = bytes(ref[p:p + 1])
            out.append(Variant(p, refb, b"T" if refb != b"T" else b"G"))
        return out

    # interleaved strains: within-strain spacing 240 (INSIDE the 300+/-30
    # fragment length, so same-strain fragments span adjacent variants),
    # cross-strain 120
    strains = [mkstrain(0), mkstrain(120)]
    mix = [[1.0, 0.0], [0.0, 1.0], [0.7, 0.3], [0.3, 0.7]]
    bam_paths = []
    for sidx, fracs in enumerate(mix):
        recs = []
        for k, (st, fr) in enumerate(zip(strains, fracs)):
            if fr <= 0:
                continue
            recs += simulate_reads(ref, st, coverage=30 * fr,
                                   seed=700 * sidx + k,
                                   name_prefix=f"l{sidx}_{k}_")
        recs.sort(key=lambda r: (r.tid, r.pos))
        path = os.path.join(tmp, f"s{sidx}.bam")
        write_bam(path, ["glink~c1"], [L], recs)
        bam_paths.append(path)

    cfg = CallerConfig(use_pallas=False, threads=1,
                       qual_by_depth_filter=8.0)
    t0 = time.time()
    start_engine("genotype", [fasta], bam_paths,
                 os.path.join(tmp, "out"), cfg)
    wall = time.time() - t0
    truth_sets = [set(v.pos for v in st) for st in strains]
    by_strain = {}
    vgs = set()
    vcf = os.path.join(tmp, "out", "glink", "glink.vcf")
    for line in open(vcf):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        if "VG" in info:
            vgs.add(info["VG"])
        st = info.get("ST")
        if st is not None:
            for sid in st.split(","):
                by_strain.setdefault(sid, set()).add(int(f[1]) - 1)
    exact = (len(by_strain) == len(truth_sets)
             and sorted(map(sorted, by_strain.values()))
             == sorted(map(sorted, truth_sets)))

    # --- forced over-split merge exercise: flight (the reference's
    # clusterer) is known to over-split one strain into several variant
    # groups; the MST/water-table merge exists to stitch them back
    # (linkage_engine.rs:122-230).  Our clusterer resolves this dataset
    # exactly, so to keep the merge path bench-covered we hand linkage a
    # deliberately position-split labelling (each strain cut at L/2) and
    # require it to reassemble both strains exactly from read linkage +
    # depth-space separations.
    from lorikeet_tpu.io.bam import open_bam
    from lorikeet_tpu.strain.genotype_mode import (
        depth_matrix, read_vcf, split_contexts,
    )
    from lorikeet_tpu.strain.linkage import LinkageEngine
    contexts, vcf_contigs, _samples = read_vcf(vcf)
    split, _f = split_contexts(contexts, 8.0, min_variant_depth=10)
    a_pos = set(v.pos for v in strains[0])
    labels = np.array([(0 if vc.start in a_pos else 2)
                       + (1 if vc.start >= L // 2 else 0)
                       for vc in split])
    X = depth_matrix(split)
    groups = sorted(set(labels.tolist()))
    cent = {g: X[labels == g].mean(axis=0) for g in groups}
    spreads = [np.linalg.norm(X[labels == g] - cent[g], axis=1).mean()
               for g in groups]
    scale = max(float(np.mean(spreads)), 1e-9)
    sep = np.zeros((len(groups), len(groups)))
    for i in groups:
        for j in groups:
            if i != j:
                sep[i, j] = np.linalg.norm(cent[i] - cent[j]) / scale
    grouped = {g: [vc for vc, lab in zip(split, labels) if lab == g]
               for g in groups}
    engine = LinkageEngine(grouped, sep)
    strain_groups = engine.run_linkage(
        [open_bam(p) for p in bam_paths], vcf_contigs or None)
    merged_exact = (sorted(sorted(s) for s in strain_groups)
                    == [[0, 1], [2, 3]])
    return wall, exact, len(vgs), len(by_strain), merged_exact


def main():
    import jax
    fast = os.environ.get("LORIKEET_BENCH_FAST") == "1"
    on_tpu = jax.default_backend() != "cpu"

    result = {"metric": "pairhmm_forward_gcups", "unit": "GCUPS/chip"}
    if on_tpu:
        gcups, spread, passes = bench_kernel_peak()
    else:
        gcups, spread, passes = 0.0, 0.0, 0
    result["value"] = round(gcups, 2)
    result["vs_baseline"] = round(gcups / BASELINE_GCUPS, 2)
    result["kernel_spread"] = round(spread, 3)
    result["kernel_passes"] = passes

    if on_tpu and not fast:
        try:
            sync_g, async_g = bench_effective_ragged()
            result["pairhmm_effective_gcups"] = round(sync_g, 2)
            result["pairhmm_effective_gcups_async"] = round(async_g, 2)
        except Exception as e:  # noqa: BLE001
            result["pairhmm_effective_gcups"] = f"error: {e}"
        try:
            result["sharded_1dev_ok"] = bench_sharded_1dev()
        except Exception as e:  # noqa: BLE001
            result["sharded_1dev_ok"] = f"error: {e}"
        try:
            rows = bench_e2e()
            host = rows.get("host_kernel")
            tpu = rows.get("tpu_dispatch")
            host_best = rows.get("host_best")
            tpu_best = rows.get("tpu_best")
            spreads = [r.get("spread", 0.0) for r in rows.values()]
            if host:
                result["e2e_host_wall_s"] = host["value"]
            if tpu:
                result["e2e_wall_s"] = tpu["value"]
                result["active_regions_per_sec"] = \
                    tpu["active_regions_per_sec"]
                result["e2e_recall"] = tpu["recall"]
            if host and tpu:
                result["e2e_tpu_speedup_vs_host"] = round(
                    host["value"] / tpu["value"], 3)
            if host_best:
                result["e2e_host_best_wall_s"] = host_best["value"]
            if tpu_best:
                result["e2e_tpu_best_wall_s"] = tpu_best["value"]
            if host_best and tpu_best:
                result["e2e_tpu_speedup_vs_best_host"] = round(
                    host_best["value"] / tpu_best["value"], 3)
            # paired A/B races override the sequential-leg ratios: each
            # ratio shares one load environment (median-of-paired-ratios,
            # sampled until the middle three agree within 15%), so a noisy
            # capture can no longer print a fake loss or a lucky win
            paired_t = rows.get("paired_t")
            paired_best = rows.get("paired_best")
            if paired_t:
                result["e2e_tpu_speedup_vs_host"] = paired_t["value"]
                result["e2e_paired_spread"] = paired_t["paired_spread"]
                result["e2e_paired_n"] = paired_t["n_pairs"]
            if paired_best:
                result["e2e_tpu_speedup_vs_best_host"] = \
                    paired_best["value"]
                result["e2e_best_paired_spread"] = \
                    paired_best["paired_spread"]
                result["e2e_best_paired_n"] = paired_best["n_pairs"]
            if spreads:
                result["e2e_spread"] = round(max(spreads), 3)
            probe = rows.get("probe")
            if probe:
                # device-service in-flight depth chosen by the startup
                # probe (1 = overlap unsafe on this link, honestly recorded)
                result["service_inflight"] = probe["value"]
        except Exception as e:  # noqa: BLE001
            result["e2e_wall_s"] = f"error: {e}"
        try:
            gw, gx = bench_genotype()
            result["genotype_e2e_wall_s"] = round(gw, 2)
            # pure (no VG group mixes strains) + complete (every planted
            # variant called and grouped) — see bench_genotype
            result["genotype_groups_pure_complete"] = bool(gx)
        except Exception as e:  # noqa: BLE001
            result["genotype_e2e_wall_s"] = f"error: {e}"
        try:
            lw, lx, nvg, nst, mx = bench_genotype_linked()
            result["genotype_linked_wall_s"] = round(lw, 2)
            # exact strain count + assignment on the 240 bp-spaced dataset
            # (read linkage CAN merge at this spacing), plus the forced
            # over-split run that makes the MST/water-table merge fire
            result["genotype_strains_exact"] = bool(lx)
            result["genotype_linked_vg_groups"] = nvg
            result["genotype_linked_strains"] = nst
            result["genotype_linkage_merge_exact"] = bool(mx)
        except Exception as e:  # noqa: BLE001
            result["genotype_strains_exact"] = f"error: {e}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
