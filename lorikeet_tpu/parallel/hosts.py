"""Multi-host (pod-slice) work distribution.

The reference's genome-level parallelism is a scoped threadpool on one
machine (/root/reference/src/processing/lorikeet_engine.rs:82,100).  The
TPU-native equivalent (SURVEY §2.4 row 1) shards the *independent*
per-genome tasks across hosts of a pod slice: every host runs the same
program under `jax.distributed`, takes a deterministic subset of genomes,
and writes its own per-genome output directories — no collective is needed
because outputs are disjoint files (the reference's per-genome output-cache
layout, lorikeet_engine.rs:135-157, is already host-disjoint).

Within a host, `--parallel-genomes` still overlaps host-bound stages, and
each genome's region batches ride the local chips via the data-parallel
mesh (parallel/sharding.py).
"""
from __future__ import annotations

import os


def distributed_context():
    """(process_index, process_count) for the current run.

    Honours an explicit LORIKEET_PROCESS_INDEX/COUNT override (useful for
    launchers that shard before jax.distributed is initialised, and for
    tests), else asks jax; single-process when neither is available."""
    env_idx = os.environ.get("LORIKEET_PROCESS_INDEX")
    env_cnt = os.environ.get("LORIKEET_PROCESS_COUNT")
    if env_cnt is not None:
        return int(env_idx or 0), int(env_cnt)
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001 — no jax runtime: single host
        return 0, 1


def host_shard(items: list, process_index: int = None,
               process_count: int = None) -> list:
    """Deterministic round-robin shard of independent work items for this
    host.  Round-robin (not block) so that genome-size skew spreads evenly
    when inputs are sorted by size."""
    if process_count is None:
        process_index, process_count = distributed_context()
    if process_count <= 1:
        return list(items)
    return [x for i, x in enumerate(items)
            if i % process_count == process_index]


def initialize_distributed(coordinator: str = None, num_processes: int = None,
                           process_id: int = None) -> tuple:
    """Bring up jax.distributed when a coordinator address is supplied
    (multi-host pod slice); no-op single-host otherwise.  Returns the
    (process_index, process_count) in effect."""
    if coordinator:
        import jax
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return distributed_context()
