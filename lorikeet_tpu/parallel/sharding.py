"""Device-mesh sharding for batched region evaluation.

The reference scales with shared-memory thread pools (rayon par_iter over
contigs/chunks/regions, /root/reference/src/haplotype/haplotype_caller_engine.rs:443-465,
assembly_region_walker.rs:139-141) and reduces per-chunk results with
fold/reduce (:599-619).  The TPU-native equivalent: pair batches are sharded
over a 1-D data axis of a jax.sharding Mesh; per-pair likelihood evaluation is
embarrassingly parallel, and the (samples x samples) comparable-base /depth
matrices reduce with psum over ICI.

``region_batch_step`` is the multi-chip unit of work: pair-HMM likelihoods for
a sharded batch of (read, hap) pairs plus a globally-psum'd depth reduction —
the same compute/communication shape the full calling pipeline uses.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
# jax.shard_map (v0.8) enforces varying-axis typing on scan carries;
# the experimental entry point with check_rep=False accepts replicated
# closure constants inside the shard (what the EM scan uses).
from jax.experimental.shard_map import shard_map

from lorikeet_tpu.ops.pairhmm import _pairhmm_jit


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def region_batch_step(mesh: Mesh, axis_name: str = "data", n_samples: int = 8):
    """Build the jitted sharded step:

    inputs (sharded along the pair axis): packed pair-HMM operands
    outputs: per-pair log10 likelihoods (sharded) and a psum'd
    [samples, positions] depth matrix (replicated), mirroring the reference's
    rayon fold over chunk depth arrays.
    """
    n = mesh.devices.size

    @functools.partial(
        shard_map, mesh=mesh, check_rep=False,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P()),
    )
    def step(haps, hap_lens, reads, read_lens, quals, iq, dq, gcp,
             lane, sample_ids, depths):
        lk = _pairhmm_jit(haps, hap_lens, reads, read_lens, quals,
                          iq, dq, gcp, lane, 1)
        # Depth reduction across chips (stand-in for the comparable-base
        # matrix fold): per-sample sum of per-pair depth vectors.
        onehot = jax.nn.one_hot(sample_ids, n_samples, dtype=depths.dtype)
        local = jnp.einsum("bs,bp->sp", onehot, depths)
        total = jax.lax.psum(local, axis_name)
        return lk, total

    return jax.jit(step)


def demo_inputs(n_pairs: int, n_samples: int = 2, R: int = 16, H: int = 32,
                seed: int = 0):
    """Tiny synthetic sharded-step inputs (for dry runs and tests)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = bases[rng.integers(0, 4, (n_pairs, H))]
    reads = np.stack([h[:R] for h in haps])
    lane = np.broadcast_to(np.arange(R + 1, dtype=np.int32), (n_pairs, R + 1)).copy()
    return (
        haps, np.full(n_pairs, H, np.int32),
        reads, np.full(n_pairs, R, np.int32),
        np.full((n_pairs, R), 30, np.uint8), np.full((n_pairs, R), 45, np.uint8),
        np.full((n_pairs, R), 45, np.uint8), np.full((n_pairs, R), 10, np.uint8),
        lane,
        rng.integers(0, n_samples, n_pairs).astype(np.int32),
        rng.random((n_pairs, 8), np.float32),
    )
