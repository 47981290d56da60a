"""Multi-device scaling harness for the pair-HMM region batch.

Measures per-device throughput of the shard_map'd region step over a
1..N-device mesh and reports scaling efficiency (BASELINE.md target:
>=80% at >=2 hosts).  On a machine with one real TPU this runs on virtual
CPU devices (correctness + harness validation — CPU timings do not
predict TPU scaling); on a real slice it measures ICI scaling directly.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python bench_scaling.py
or on a pod slice: python bench_scaling.py

Prints one JSON line per mesh size plus a summary line.
"""
import json
import os
import sys
import time


import numpy as np


def main():
    import jax
    if "--real" not in sys.argv:
        # default: virtual 8-device CPU mesh (harness/correctness
        # validation on single-chip machines).  Must run before any
        # backend initialization; pass --real on a pod slice to measure
        # actual ICI scaling.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", "cpu")
    from lorikeet_tpu.parallel.sharding import (
        demo_inputs, make_mesh, region_batch_step,
    )

    devices = jax.devices()
    R, H = 64, 128
    per_device_pairs = 512
    results = {}
    sizes = [n for n in (1, 2, 4, 8, len(devices)) if n <= len(devices)]
    for n in sorted(set(sizes)):
        mesh = make_mesh(np.array(devices[:n]))
        step = region_batch_step(mesh)
        args = demo_inputs(per_device_pairs * n, R=R, H=H)
        out, depth = step(*args)
        np.asarray(out)                       # compile + settle
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out, depth = step(*args)
        np.asarray(out)
        dt = time.time() - t0
        cells = per_device_pairs * n * R * H * iters
        gcups = cells / dt / 1e9
        results[n] = gcups
        print(json.dumps({"devices": n, "gcups": round(gcups, 2),
                          "gcups_per_device": round(gcups / n, 2)}))
    base = results[min(results)]
    top = max(results)
    eff = results[top] / (base * top) if base > 0 else 0.0
    line = {"metric": "scaling_efficiency",
            "devices": top,
            "value": round(eff, 3),
            "unit": "fraction_of_linear"}
    if "--real" not in sys.argv:
        # virtual CPU devices share the physical cores AND the n=1
        # baseline already uses them all via XLA intra-op threading, so
        # this number reflects host oversubscription, not ICI scaling
        line["backend"] = "cpu-virtual"
        line["physical_cores"] = os.cpu_count()
        line["note"] = ("harness validation only; ICI efficiency "
                        "requires a real slice (--real)")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
