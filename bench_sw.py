"""Smith-Waterman device-vs-host benchmark (VERDICT r2 item 6): measure
ops.sw_pallas.align_batch_pallas against the native host aligner across the
per-batch job counts production actually produces (read realignment: ~tens
to a few thousand jobs per span; dangling ends / hap-vs-ref: a handful),
and report the crossover, so the routing default is a measured decision.

Contract: smith_waterman_aligner.rs:47-113 (align semantics; both paths
are bit-identical, tests/test_sw_pallas.py).

Usage: python bench_sw.py            (on the TPU host)
Prints one JSON line per batch size plus a summary.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    from lorikeet_tpu.ops.smith_waterman import (
        NEW_SW_PARAMETERS, OverhangStrategy, align,
    )
    from lorikeet_tpu.ops.sw_pallas import align_batch_pallas

    if jax.default_backend() == "cpu":
        print("# needs the TPU backend", file=sys.stderr)
        return

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def mk_pairs(n, ref_len=300, alt_len=280):
        pairs = []
        for _ in range(n):
            ref = bases[rng.integers(0, 4, ref_len)]
            # alt = mutated window of ref (realistic realignment job)
            lo = int(rng.integers(0, ref_len - alt_len + 1))
            alt = ref[lo:lo + alt_len].copy()
            for _ in range(int(rng.integers(1, 6))):
                alt[int(rng.integers(0, alt_len))] = bases[
                    int(rng.integers(0, 4))]
            pairs.append((ref, alt))
        return pairs

    strategy = OverhangStrategy.SOFTCLIP
    rows = []
    for n in (16, 128, 1024, 4096):
        pairs = mk_pairs(n)
        # warm the device bucket
        align_batch_pallas(pairs[:16], NEW_SW_PARAMETERS, strategy)

        t0 = time.time()
        host = [align(r, a, NEW_SW_PARAMETERS, strategy) for r, a in pairs]
        host_s = time.time() - t0

        t0 = time.time()
        dev = align_batch_pallas(pairs, NEW_SW_PARAMETERS, strategy)
        dev_s = time.time() - t0

        match = sum(1 for h, d in zip(host, dev) if h == d)
        row = dict(metric="sw_align_batch_s", n_jobs=n,
                   host_s=round(host_s, 4), device_s=round(dev_s, 4),
                   device_speedup=round(host_s / dev_s, 2),
                   bit_identical=match == n)
        rows.append(row)
        print(json.dumps(row))

    best = max(rows, key=lambda r: r["device_speedup"])
    print(json.dumps(dict(metric="sw_crossover",
                          device_wins_at=[r["n_jobs"] for r in rows
                                          if r["device_speedup"] > 1.0],
                          best_speedup=best["device_speedup"],
                          best_n=best["n_jobs"])))


if __name__ == "__main__":
    main()
