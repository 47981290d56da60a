"""Pallas TPU kernel for the pair-HMM forward wavefront.

Same anti-diagonal formulation as ops.pairhmm.pairhmm_forward_batch (lane axis
= read position, haplotype bases stream through a shift register), but the
entire DP state lives in VMEM for the whole sweep: one grid step processes a
[TB] tile of (read, hap) pairs, running all diagonals in nested ``fori_loop``s
of pure VPU ops.  The XLA scan version round-trips ~10 state arrays through
HBM every diagonal; here HBM traffic is one read of the inputs and one [TB,1]
write, making the kernel compute-bound.

Numerics contract: /root/reference/src/pair_hmm/pair_hmm.rs:503-615 (see
ops/pairhmm.py docstring).  f32 with per-diagonal renormalisation.

Mosaic lowering constraints discovered on TPU v5e (each cost a real compile
failure; keep them in mind when editing):
- lane-dim dynamic slices must be 128-aligned -> the hap stream is consumed
  through 128-wide aligned windows + one-step rolls;
- [TB,1] lane slices broadcast against [TB,128] fail relayout -> extract
  columns via masked reductions (lane-replicated result);
- lane-replicated broadcasts flowing into loop-carried products break layout
  unification ("Invalid relayout ... replicated in destination but not in
  source") -> de-replicate ``scale`` by mixing in a ref-loaded value.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lorikeet_tpu.ops.pairhmm import TRISTATE_CORRECTION

_LANES = 128

# One-hot base-bit encoding (host LUT).  The kernel's N-aware base match
# ((r == h) | r == N | h == N, pair_hmm.rs:536-545) collapses to a single
# AND+compare when every base maps to a bit and N maps to all bits.  IUPAC
# ambiguity codes get distinct bits (the reference matches by *byte
# equality*, not IUPAC intersection); lowercase folds to uppercase (decoders
# upstream emit uppercase); all remaining byte values share one "unknown"
# bit — two *different* unknown bytes would spuriously match, but such bytes
# cannot reach the kernel through the BAM/FASTA decoders.
_BASE_BITS = np.zeros(256, np.int32)
for _i, _ch in enumerate(b"ACGT"):
    _BASE_BITS[_ch] = 1 << _i
for _i, _ch in enumerate(b"RYSWKMBDHVU="):
    _BASE_BITS[_ch] = 1 << (4 + _i)
_BASE_BITS[_BASE_BITS == 0] = 1 << 20
for _ch in b"acgtryswkmbdhvu":
    _BASE_BITS[_ch] = _BASE_BITS[_ch - 32]
_BASE_BITS[ord("N")] = _BASE_BITS[ord("n")] = (1 << 21) - 1

# Diagonals per renormalisation group (unrolled in the kernel body).  8 steps
# decay at most ~1e-44, above the f32 denormal floor; must divide 128.  Module
# constant (not a jit arg): changing it mid-process does not invalidate the
# jit cache, so set it before the first kernel call.
GROUP = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _base_bits_jnp(codes):
    """In-kernel byte -> one-hot base-bit conversion (the _BASE_BITS host
    LUT as a select chain; gathers are not a TPU-friendly shape).  Byte 0
    (padding) maps to no bits; unmapped bytes share the unknown bit."""
    u = codes.astype(jnp.int32)
    u = jnp.where((u >= 97) & (u <= 122), u - 32, u)      # fold lowercase
    bits = jnp.where(u == 0, 0, 1 << 20)
    for k, ch in enumerate(b"ACGT"):
        bits = jnp.where(u == ch, 1 << k, bits)
    for k, ch in enumerate(b"RYSWKMBDHVU="):
        bits = jnp.where(u == ch, 1 << (4 + k), bits)
    bits = jnp.where(u == ord("N"), (1 << 21) - 1, bits)
    return bits


def _col(x, idx):
    # Masked-reduction column extract: produces a lane-replicated [TB,1]
    # (direct lane slices like x[:, 0:1] break Mosaic relayout when later
    # broadcast against [TB, lanes] operands).
    it = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.sum(jnp.where(it == idx, x, 0), axis=1, keepdims=True)


def _kernel(quals, ins_q, del_q, gcp_q, read_u8, hap_u8, lens, out, *,
            nchunks: int):
    """Wavefront kernel over u8 operands: the f32 transition/prior arrays
    are derived IN-KERNEL from the phred bytes (one exp pass per element).
    Shipping u8 instead of precomputed f32 cuts H2D bytes ~4x — the
    tunneled backend moves ~45-80 MB/s, so operand bytes, not FLOPs, bound
    production throughput (docs/benchmarks.md round 3)."""
    f32 = jnp.float32
    TB, Rpad = quals.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, Rpad), 1)
    col = _col

    lens_v = lens[...]
    # Per-pair scalars live as full-width [TB, Rpad] arrays ([TB,1] carried
    # values interact badly with Mosaic loop layouts).
    read_len = jnp.broadcast_to(col(lens_v, 0), (TB, Rpad))
    hap_len = jnp.broadcast_to(col(lens_v, 1), (TB, Rpad))
    boundary = lane == 0
    is_end_row = lane == read_len
    rl_p1 = read_len + 1                                      # loop-invariant
    hap_len_u = hap_len.astype(jnp.uint32)
    b0 = 1.0 / jnp.maximum(hap_len, 1).astype(f32)            # [TB,Rpad]

    # ---- prologue: phred u8 -> probabilities (once per block).  Zero
    # coefficients outside lanes 1..read_len reproduce the host-packed
    # zero regions that the plain-roll wraps rely on (lane 0) and leave
    # non-contributing lanes inert.  exp is one transcendental pass per
    # element, amortised over nchunks*128 diagonals.
    ln10_over_m10 = np.float32(-np.log(10.0) / 10.0)
    ok = (lane >= 1) & (lane <= read_len)
    eps = jnp.where(ok, jnp.exp(quals[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
    tmi = jnp.where(ok, jnp.exp(ins_q[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
    tmd = jnp.where(ok, jnp.exp(del_q[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
    eg = jnp.where(ok, jnp.exp(gcp_q[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
    tmm = 1.0 - jnp.minimum(1.0, tmi + tmd)
    tim = 1.0 - eg
    tii = eg
    tdd = eg
    pm = 1.0 - eps
    px = eps * np.float32(1.0 / TRISTATE_CORRECTION)
    rp = jnp.where(ok, _base_bits_jnp(read_u8[...]), 0)

    def window_of(c):
        start = pl.multiple_of(c * _LANES, _LANES)
        return _base_bits_jnp(hap_u8[:, pl.ds(start, _LANES)])  # [TB,128]

    _dp_sweep(out, window_of, nchunks, TB, Rpad, boundary, is_end_row,
              rl_p1, hap_len_u, b0,
              tmm, tim, tmi, tii, tmd, tdd, pm, px, rp)


def _dp_sweep(out, window_of, nchunks, TB, Rpad, boundary, is_end_row,
              rl_p1, hap_len_u, b0, tmm, tim, tmi, tii, tmd, tdd, pm, px,
              rp):
    """The shared anti-diagonal DP sweep (used by the per-pair kernel and
    the grouped (read-tile x hap) kernel; see _kernel for semantics)."""
    f32 = jnp.float32
    zeros = jnp.zeros((TB, Rpad), f32)

    # State shifts are PLAIN cyclic rolls — no boundary-zeroing select.  The
    # wrapped lane-(Rpad-1) value lands in lane 0, where every consumer is
    # multiplied by a coefficient the host packs as zero: prior (pm = px = 0
    # on lane 0) kills it in m_new, and tmi = tii = 0 on lane 0 kill it in
    # i_new; d_new's lane 0 is overwritten by the boundary select.  This
    # saves three selects per diagonal (~8% of the op budget).
    shift = lambda x: pltpu.roll(x, 1, 1)

    _GROUP = GROUP  # diagonals per renormalisation

    # Entering hap base: only lane 0 (the boundary) of the entering value
    # is ever consumed, so the per-chunk 128-lane hap window — zero-padded
    # to Rpad once per chunk — feeds hapd directly through the boundary
    # select; the old masked-reduction broadcast (iota+where+cross-lane
    # sum) per step is pure overhead.

    def body(g, chunk_carry):
        # A group of _GROUP diagonals d = c*128 + g*_GROUP + s + 1, then one
        # power-of-two renormalisation.  Entering hap base hap[d-1] is the
        # head of the rolling window (Mosaic only allows lane-aligned dynamic
        # slices, so the stream is consumed via offset-0 extract + roll).
        # sm/si/sd memoize shift(m1)/shift(i1)/shift(d1) of the PREVIOUS
        # step: this step's two-generation terms shift(m2)/shift(i2+d2) are
        # exactly those, so each step rolls 3 arrays instead of 4.
        c, carry, window = chunk_carry
        m1, i1, d1, sm, si, sd, hapd, bval, acc, ls = carry
        for s in range(_GROUP):
            d = c * _LANES + g * _GROUP + s + 1
            hapd = jnp.where(boundary, window, pltpu.roll(hapd, 1, 1))
            window = pltpu.roll(window, Rpad - 1, 1)

            # one-hot bit match: bases are _BASE_BITS codes, N = all bits
            base_match = (rp & hapd) != 0
            prior = jnp.where(base_match, pm, px)

            # prior / tmi / tii are 0 on lane 0, so m_new/i_new are already
            # 0 on the boundary row — no explicit select needed there
            m_new = prior * (sm * tmm + (si + sd) * tim)
            new_sm = shift(m1)
            new_si = shift(i1)
            i_new = new_sm * tmi + new_si * tii
            d_new = jnp.where(boundary, bval, m1 * tmd + d1 * tdd)

            # hap column j = d - read_len; in-range 1..hap_len via a single
            # unsigned compare of j-1 (negatives wrap huge)
            j0u = (d - rl_p1).astype(jnp.uint32)               # [TB,Rpad]
            valid = (j0u < hap_len_u) & is_end_row
            acc = acc + jnp.where(valid, m_new + i_new, 0.0)
            sm, si, sd = new_sm, new_si, shift(d1)
            m1, i1, d1 = m_new, i_new, d_new

        # Renormalise all live state by a power-of-two scale derived from the
        # group *interior* max's exponent bits (replaces the reference's
        # 2^1020 f64 initial condition).  Exact and transcendental-free:
        # full-width log10 or fp division per step would dominate the kernel.
        # The constant boundary row is excluded from the peak — including it
        # pins the scale and flushes deep low-likelihood cells (boundary
        # re-seeds row 1 every diagonal, bounding scaled-boundary growth).
        interior = jnp.maximum(m1, jnp.maximum(i1, jnp.where(boundary, 0.0, d1)))
        peak = jnp.max(interior, axis=1, keepdims=True)
        peak = jnp.maximum(peak, jnp.max(acc, axis=1, keepdims=True))
        peak = jnp.broadcast_to(jnp.where(peak > 0, peak, 1.0), (TB, Rpad))
        # De-replicate (see module docstring); 0*x is not foldable under NaN
        # semantics so this survives optimisation.
        peak = peak + 0.0 * tmm
        e = jax.lax.shift_right_logical(pltpu.bitcast(peak, jnp.int32), 23) & 0xFF
        inv = pltpu.bitcast(jax.lax.shift_left(254 - e, 23), jnp.float32)  # 2^(127-e)
        carry = (m1 * inv, i1 * inv, d1 * inv,
                 sm * inv, si * inv, sd * inv,
                 hapd, bval * inv, acc * inv, ls + (e - 127))
        return (c, carry, window)

    def chunk_body(c, carry):
        window = window_of(c)
        if window.shape[0] != TB:
            # grouped mode: one hap row broadcast over the read tile
            window = jnp.broadcast_to(window, (TB, window.shape[1]))
        if Rpad > _LANES:
            # zero-pad once per chunk so the per-step boundary select and
            # roll operate lane-for-lane against the state arrays
            window = jnp.concatenate(
                [window, jnp.zeros((TB, Rpad - _LANES), window.dtype)], 1)
        _, carry, _ = jax.lax.fori_loop(0, _LANES // _GROUP, body,
                                        (c, carry, window))
        return carry

    init_d = jnp.where(boundary, b0, 0.0)
    carry = (zeros, zeros, init_d, zeros, zeros, zeros,
             jnp.zeros((TB, Rpad), jnp.int32), b0, zeros,
             jnp.zeros((TB, Rpad), jnp.int32))
    carry = jax.lax.fori_loop(0, nchunks, chunk_body, carry)
    acc, ls = carry[8], carry[9]
    total = jnp.sum(acc, axis=1, keepdims=True)
    # ls lanes are identical; log10(2^ls) = ls * log10(2)
    ls_col = jnp.max(ls, axis=1, keepdims=True).astype(f32) * np.float32(np.log10(2.0))
    out[...] = jnp.log10(jnp.maximum(total, jnp.finfo(f32).tiny)) + ls_col


def vmem_safe_block(Rpad: int, requested: int) -> int:
    """Largest block <= requested that fits the ~16MB scoped-VMEM budget:
    ~20 live [block, Rpad] f32 arrays put the ceiling at block*Rpad ~= 32k
    (block 256 at Rpad 128 measured 16.18M/16M OOM at Rpad 256).

    Rounded down to a power of two so the block always divides the
    B_SLAB-multiple batch — a non-divisor grid (e.g. 51 at Rpad 640)
    would leave the trailing B % block rows of every slab unwritten."""
    cap = max(32, (256 * 128) // Rpad)
    block = min(requested, cap)
    return 1 << (block.bit_length() - 1)


def _pallas_call(quals, ins_q, del_q, gcp_q, read_u8, hap_u8,
                 lens, nchunks, block_b, interpret):
    """Raw pallas_call (unjitted) — wrapped by the single-chip jit below and
    by the shard_map body in parallel.sharding (each device runs this on its
    local rows; the kernel itself is unchanged under sharding)."""
    B, Rpad = quals.shape
    block_b = vmem_safe_block(Rpad, block_b)
    grid = (B // block_b,)
    row = lambda i: (i, 0)
    spec_r = pl.BlockSpec((block_b, Rpad), row, memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((block_b, hap_u8.shape[1]), row, memory_space=pltpu.VMEM)
    spec_l = pl.BlockSpec((block_b, lens.shape[1]), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, nchunks=nchunks),
        grid=grid,
        in_specs=[spec_r] * 5 + [spec_s, spec_l],
        out_specs=pl.BlockSpec((block_b, 1), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )(quals, ins_q, del_q, gcp_q, read_u8, hap_u8, lens)


_pairhmm_pallas_jit = functools.partial(
    jax.jit, static_argnames=("nchunks", "block_b", "interpret"))(_pallas_call)


@functools.lru_cache(maxsize=None)
def make_sharded_pairhmm(mesh, axis: str, nchunks: int, block_b: int,
                         interpret: bool):
    """Jitted shard_map over the Pallas kernel: the batch axis is sharded
    over the mesh, each chip sweeps its local rows (the reference's rayon
    region fan-out, assembly_region_walker.rs:139-141, as a device mesh).
    Cached per (mesh, shape bucket) — one compile per bucket per mesh."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(
        shard_map, mesh=mesh, check_rep=False,
        in_specs=tuple([P(axis)] * 7), out_specs=P(axis))
    def step(*ops):
        return _pallas_call(*ops, nchunks=nchunks, block_b=block_b,
                            interpret=interpret)

    return jax.jit(step)


def pairhmm_forward_sharded(slabs, nchunks, B, mesh, axis: str = "data",
                            block_b: int = 64,
                            interpret: bool = False,
                            force: bool = False) -> jnp.ndarray:
    """Run prepacked B_SLAB slabs over a device mesh: each slab's batch axis
    is split B_SLAB/n rows per chip (one dispatch per slab, every chip
    sweeping its shard — the reference's rayon region fan-out on ICI).  The
    per-shard compile shape is FIXED per mesh size, so Mosaic compiles once
    per (Rpad, nchunks) bucket exactly like the single-chip path.  Falls
    back to single-device dispatch when the mesh cannot split a slab —
    unless ``force``, which takes the shard_map lowering even on a 1-device
    mesh (validates Mosaic-under-shard_map on real hardware, where no
    multi-chip mesh exists to exercise it)."""
    n = mesh.devices.size
    if (n <= 1 and not force) or B_SLAB % n:
        return pairhmm_forward_packed(slabs, nchunks, B, block_b, interpret)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    step = make_sharded_pairhmm(mesh, axis, nchunks, block_b, interpret)
    devices = list(mesh.devices.flat)
    per = B_SLAB // n
    outs = []
    for slab in slabs:
        global_ops = [
            jax.make_array_from_single_device_arrays(
                (B_SLAB,) + tuple(op.shape[1:]), sharding,
                [jax.device_put(op[d * per:(d + 1) * per], dev)
                 for d, dev in enumerate(devices)])
            for op in slab]
        outs.append(step(*global_ops))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(
        [jnp.asarray(o) for o in outs], axis=0)
    return np.asarray(out)[:B, 0]


def pack_pallas_inputs(
    haps, hap_lens, reads, read_lens, quals, ins_quals, del_quals, gcps,
    block_b: int = 64, to_device: bool = True,
):
    """Host-side numpy precompute of the kernel operands (transition probs,
    priors, hap stream).  Returns (operand_tuple, nchunks, B).  Pack once,
    run many — the packing is O(B*Rpad) numpy work that must stay off the
    kernel's steady-state path.
    """
    haps = np.asarray(haps)
    reads = np.asarray(reads)
    B, Rmax = reads.shape
    Hmax = haps.shape[1]
    Rpad = _round_up(Rmax + 1, _LANES)
    # batch always pads to whole B_SLAB slabs: exactly one compiled shape
    # per (Rpad, nchunks) bucket regardless of batch size
    Bpad = _round_up(max(B, 1), B_SLAB)
    # diagonals d = 1 .. Rmax+Hmax, padded to whole 128-step chunks (overrun
    # steps are masked out of the accumulator)
    nchunks = max(1, -(-(Rmax + Hmax) // _LANES))

    # u8 operands only: the f32 transition/prior arrays are derived
    # IN-KERNEL (see _kernel prologue).  H2D over the tunneled backend
    # moves ~45-80 MB/s, so shipping 5 u8 planes + the u8 hap stream
    # instead of 8 f32 + 2 i32 planes cuts the per-slab transfer ~6x —
    # operand bytes, not kernel FLOPs, bound ragged production batches.
    u8 = np.uint8
    q = np.zeros((Bpad, Rpad), u8)
    iq = np.zeros((Bpad, Rpad), u8)
    dq = np.zeros((Bpad, Rpad), u8)
    gq = np.zeros((Bpad, Rpad), u8)
    # position 0 is the boundary row; read data occupies lanes 1..Rmax
    q[:B, 1:Rmax + 1] = np.asarray(quals, u8)
    iq[:B, 1:Rmax + 1] = np.asarray(ins_quals, u8)
    dq[:B, 1:Rmax + 1] = np.asarray(del_quals, u8)
    gq[:B, 1:Rmax + 1] = np.asarray(gcps, u8)
    read_u8 = np.zeros((Bpad, Rpad), u8)
    read_u8[:B, 1:Rmax + 1] = np.asarray(reads, u8)
    # hap_u8[:, k] == hap[k]: entering base for diagonal d=k+1
    Spad = nchunks * _LANES
    hap_u8 = np.zeros((Bpad, Spad), u8)
    hap_u8[:B, :Hmax] = np.asarray(haps, u8)
    lens = np.zeros((Bpad, _LANES), np.int32)
    lens[:B, 0] = read_lens
    lens[:B, 1] = hap_lens
    lens[B:, 0] = 1
    lens[B:, 1] = 1

    # Slab split happens HERE, on host numpy: device-side slicing per call
    # costs ~10x in steady-state dispatch (measured 2 vs 20 GCUPS at B=8192).
    # ``to_device=False`` keeps numpy slabs for the mesh path, which
    # device_puts per-shard slices itself (no default-device detour).
    host_ops = (q, iq, dq, gq, read_u8, hap_u8, lens)
    conv = jnp.asarray if to_device else (lambda x: x)
    slabs = [tuple(conv(op[lo:lo + B_SLAB]) for op in host_ops)
             for lo in range(0, Bpad, B_SLAB)]
    return slabs, nchunks, B


B_SLAB = 1024  # fixed batch slab: kills per-batch-size Mosaic recompiles


def pairhmm_forward_packed(slabs, nchunks, B, block_b: int = 64,
                           interpret: bool = False) -> jnp.ndarray:
    """Run the kernel on prepacked slab operands (see pack_pallas_inputs).

    Execution is slabbed to a FIXED batch of B_SLAB rows: compile shapes
    depend only on (Rpad, nchunks) buckets, never on the batch size —
    each fresh Mosaic compile costs minutes (and is NOT persisted across
    processes on the axon tunnel), so batch-size shape diversity is the
    thing to kill.  All slabs are enqueued before the single readback
    (the tunnel costs ~27 ms per D2H round trip)."""
    outs = [_pairhmm_pallas_jit(*slab, nchunks, block_b, interpret)
            for slab in slabs]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:B, 0]


def pairhmm_forward_pallas(
    haps, hap_lens, reads, read_lens, quals, ins_quals, del_quals, gcps,
    block_b: int = 64, interpret: bool = False,
) -> jnp.ndarray:
    """Batched forward log10-likelihoods via the Pallas kernel; API matches
    ops.pairhmm.pairhmm_forward_batch.  B is padded to a multiple of
    ``block_b``, the lane axis to 128."""
    operands, nchunks, B = pack_pallas_inputs(
        haps, hap_lens, reads, read_lens, quals, ins_quals, del_quals, gcps,
        block_b)
    return pairhmm_forward_packed(operands, nchunks, B, block_b, interpret)


# ---------- grouped (read-tile x hap) dispatch: dedup H2D traffic ----------
#
# Production pair batches are regions' (reads x haplotypes) cross products:
# the flat per-pair layout re-ships every read once per haplotype and every
# haplotype once per read.  Over the ~45-80 MB/s tunneled H2D link that
# redundancy — not kernel speed — bounds throughput (docs/benchmarks.md
# round 3).  Here reads are shipped ONCE as [rows, Rpad] u8 planes, haps
# ONCE as [n_haps, Spad] u8 rows, and a scalar-prefetch table drives a
# (read-tile, hap) grid: block i sweeps read tile tile_tab[i] against hap
# row hap_tab[i].  For a typical 300-read x 6-hap region this is ~14x fewer
# bytes than the flat layout.

#: dispatch sizing: caps bound one dispatch; the packed arrays are sized to
#: the WORK in steps (rows of 1024, blocks of 128), so compile-shape
#: diversity stays tiny (<=4 variants per (Rpad, nchunks)) while padding
#: never ships more than one step of dead bytes over the 45-80 MB/s link.
#: grouped-dispatch tile height: 32 rows halves the pad-row compute for
#: the dominant production shape (~25-50 reads per region) vs 64, at the
#: same per-row VPU efficiency (sublane multiples of 8)
GROUP_BLOCK_B = 32

NBLOCKS_CAP = 512
NBLOCKS_STEP = 128
ROWS_CAP = 4096
ROWS_STEP = 1024
HAPS_CAP = 512


def _kernel_grouped(tile_tab, hap_tab, hoff_tab, hlen_tab, quals, ins_q,
                    del_q, gcp_q, read_u8, hap_u8, lens, out, *,
                    nchunks: int):
    """Grouped-mode kernel: same DP sweep, hap row broadcast over the read
    tile.  The hap plane arrives as an 8-row block (Mosaic requires
    8-divisible sublane blocks); hoff_tab picks the row, hlen_tab carries
    the hap length (a u8 plane cannot hold lengths >255)."""
    f32 = jnp.float32
    TB, Rpad = quals.shape
    i = pl.program_id(0)
    hlen = hlen_tab[i]

    # pad blocks (hlen_tab == 1; real haplotypes are >= kmer size) carry
    # no wanted output rows — skip their whole DP sweep.  Production span
    # batches land in the fixed-shape dispatch variants at 30-40% block
    # occupancy, so this predication is worth ~2-3x effective throughput.
    @pl.when(hlen > 1)
    def _run():
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, Rpad), 1)
        read_len = jnp.broadcast_to(_col(lens[...], 0), (TB, Rpad))
        hoff = hoff_tab[i]
        hap_len = jnp.full((TB, Rpad), hlen, jnp.int32)
        boundary = lane == 0
        is_end_row = lane == read_len
        rl_p1 = read_len + 1
        hap_len_u = hap_len.astype(jnp.uint32)
        b0 = 1.0 / jnp.maximum(hap_len, 1).astype(f32)

        ln10_over_m10 = np.float32(-np.log(10.0) / 10.0)
        ok = (lane >= 1) & (lane <= read_len)
        eps = jnp.where(ok, jnp.exp(
            quals[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
        tmi = jnp.where(ok, jnp.exp(
            ins_q[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
        tmd = jnp.where(ok, jnp.exp(
            del_q[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
        eg = jnp.where(ok, jnp.exp(
            gcp_q[...].astype(jnp.int32).astype(f32) * ln10_over_m10), 0.0)
        tmm = 1.0 - jnp.minimum(1.0, tmi + tmd)
        tim = 1.0 - eg
        tii = eg
        tdd = eg
        pm = 1.0 - eps
        px = eps * np.float32(1.0 / TRISTATE_CORRECTION)
        rp = jnp.where(ok, _base_bits_jnp(read_u8[...]), 0)

        def window_of(c):
            start = pl.multiple_of(c * _LANES, _LANES)
            w8 = _base_bits_jnp(hap_u8[:, pl.ds(start, _LANES)])  # [8,128]
            srow = jax.lax.broadcasted_iota(jnp.int32, w8.shape, 0)
            return jnp.sum(jnp.where(srow == hoff, w8, 0), axis=0,
                           keepdims=True)                         # [1,128]

        _dp_sweep(out, window_of, nchunks, TB, Rpad, boundary, is_end_row,
                  rl_p1, hap_len_u, b0,
                  tmm, tim, tmi, tii, tmd, tdd, pm, px, rp)


def _grouped_call(tile_tab, hap_tab, hoff_tab, hlen_tab, quals, ins_q,
                  del_q, gcp_q, read_u8, hap_u8, lens, nchunks, block_b,
                  interpret):
    rows, Rpad = quals.shape
    block_b = vmem_safe_block(Rpad, block_b)
    Spad = hap_u8.shape[1]
    nblocks = tile_tab.shape[0]
    spec_r = lambda: pl.BlockSpec((block_b, Rpad),
                                  lambda i, tt, ht, ho, hl: (tt[i], 0),
                                  memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[spec_r() for _ in range(5)] + [
            pl.BlockSpec((8, Spad), lambda i, tt, ht, ho, hl: (ht[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, lens.shape[1]),
                         lambda i, tt, ht, ho, hl: (tt[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1),
                               lambda i, tt, ht, ho, hl: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_grouped, nchunks=nchunks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * block_b, 1), jnp.float32),
        interpret=interpret,
    )(tile_tab, hap_tab, hoff_tab, hlen_tab, quals, ins_q, del_q, gcp_q,
      read_u8, hap_u8, lens)


_grouped_jit = functools.partial(
    jax.jit, static_argnames=("nchunks", "block_b", "interpret"))(
        _grouped_call)


def pack_grouped_inputs(pairs, block_b: int = GROUP_BLOCK_B):
    """Dedup a flat (hap, read, q, iq, dq, gcp) pair list into grouped
    dispatches.  Reads sharing an identical haplotype set (i.e. one
    region's reads) tile together; each dispatch ships each read and hap
    exactly once.  Returns (dispatches, out_pos, Rpad, nchunks) where
    each dispatch is (tables, operands) sized to the fixed slab caps and
    out_pos[k] is the flat output row of pairs[k]."""
    # --- per-read grouping: read id -> (read row data, hap ids, pair ks)
    # compile-shape bucketing mirrors calling.likelihoods._pallas_bucket:
    # lane-fit read bucket (32k-1) + 128-multiple hap bucket, so repeated
    # batches share one (Rpad, nchunks) compile
    Rmax = _round_up(max(len(p[1]) for p in pairs) + 1, 32) - 1
    Hmax = _round_up(max(len(p[0]) for p in pairs), _LANES)
    Rpad = _round_up(Rmax + 1, _LANES)
    # nchunks rounds up to EVEN: halves the bucket count (cold compiles
    # are the scarce resource on the tunnel, not kernel FLOPs — padded
    # diagonals cost sweep time only, no extra bytes)
    nchunks = _round_up(max(1, -(-(Rmax + Hmax) // _LANES)), 2)
    Spad = nchunks * _LANES
    block_b = vmem_safe_block(Rpad, block_b)  # must match _grouped_call

    hap_row_of = {}
    hap_list = []
    reads = {}            # id(read bases) -> dict
    read_order = []
    for k, (hap, read, q, iq, dq, gcp) in enumerate(pairs):
        hid = id(hap)
        if hid not in hap_row_of:
            hap_row_of[hid] = len(hap_list)
            hap_list.append(hap)
        rid = id(read)
        ent = reads.get(rid)
        if ent is None:
            ent = {"data": (read, q, iq, dq, gcp), "haps": [], "ks": [],
                   "hapset": set()}
            reads[rid] = ent
            read_order.append(rid)
        ent["haps"].append(hap_row_of[hid])
        ent["ks"].append(k)
        ent["hapset"].add(hap_row_of[hid])

    # --- group reads by identical hap set (the region structure).
    # A read shared by OVERLAPPING regions accumulates both regions' haps
    # into one key: it then tiles alone against the union — correct for
    # every (read, hap) pair, merely less dense than per-region tiling.
    # The key DEDUPES repeated haps (a pair list may name the same hap
    # several times for one read); out_pos assignment below maps every
    # duplicate pair to the one computed cell.
    groups = {}
    for rid in read_order:
        ent = reads[rid]
        key = tuple(dict.fromkeys(ent["haps"]))   # ordered, deduped
        groups.setdefault(key, []).append(rid)

    # --- emit dispatches under the fixed slab caps
    dispatches = []
    out_pos = np.empty(len(pairs), np.int64)

    def new_state():
        return {"rows": [], "hapset": [], "blocks": [], "row_of_hap": {}}

    st = new_state()

    def flush():
        if not st["blocks"]:
            return
        rows = st["rows"]
        n_rows = len(rows)
        # EXACTLY two compile variants — small (ROWS_STEP, NBLOCKS_STEP)
        # and full (ROWS_CAP, NBLOCKS_CAP), tied TOGETHER: a mixed combo
        # like (ROWS_CAP, NBLOCKS_STEP) is a fresh ~10s inline Mosaic
        # compile the prewarm never covered (measured: one such batch cost
        # a 12s e2e stall)
        small = (n_rows <= ROWS_STEP
                 and len(st["blocks"]) <= NBLOCKS_STEP)
        rows_pad = ROWS_STEP if small else ROWS_CAP
        u8 = np.uint8
        q = np.zeros((rows_pad, Rpad), u8)
        iqp = np.zeros((rows_pad, Rpad), u8)
        dqp = np.zeros((rows_pad, Rpad), u8)
        gqp = np.zeros((rows_pad, Rpad), u8)
        rdp = np.zeros((rows_pad, Rpad), u8)
        lens = np.ones((rows_pad, 8), np.int32)
        for r, (read, qq, iq, dq, gcp) in enumerate(rows):
            L = len(read)
            q[r, 1:L + 1] = qq
            iqp[r, 1:L + 1] = iq
            dqp[r, 1:L + 1] = dq
            gqp[r, 1:L + 1] = gcp
            rdp[r, 1:L + 1] = read
            lens[r, 0] = L
        hap_u8 = np.zeros((HAPS_CAP, Spad), u8)
        hlens = np.ones(HAPS_CAP, np.int32)
        for hrow, hap in st["hapset"]:
            hap_u8[hrow, :len(hap)] = hap
            hlens[hrow] = len(hap)
        nb = NBLOCKS_STEP if small else NBLOCKS_CAP
        tile_tab = np.zeros(nb, np.int32)
        hap_tab = np.zeros(nb, np.int32)
        hoff_tab = np.zeros(nb, np.int32)
        hlen_tab = np.ones(nb, np.int32)
        for b, (tile, hrow) in enumerate(st["blocks"]):
            tile_tab[b] = tile
            # hap blocks are 8 sublanes (Mosaic divisibility); the scalar
            # offset picks the row inside the block
            hap_tab[b] = hrow // 8
            hoff_tab[b] = hrow % 8
            hlen_tab[b] = hlens[hrow]
        dispatches.append(((tile_tab, hap_tab, hoff_tab, hlen_tab),
                          (q, iqp, dqp, gqp, rdp, hap_u8, lens),
                          (n_rows, len(st["hapset"]))))
        flushed_out_rows[0] += nb * block_b
        st.clear()
        st.update(new_state())

    flushed_out_rows = [0]   # cumulative output rows of flushed dispatches

    def dispatch_base():
        # flat output offset of the CURRENT dispatch (before it is flushed)
        return flushed_out_rows[0]

    for key, rids in groups.items():
        haps_rows = list(key)
        # map group's hap rows into the dispatch-local hap table
        n_read = len(rids)
        n_tiles = -(-n_read // block_b)
        need_blocks = n_tiles * len(haps_rows)
        if need_blocks > NBLOCKS_CAP or n_tiles * block_b > ROWS_CAP:
            # split oversized groups by read subsets (bounded by BOTH the
            # block budget and the read-row budget)
            sub = min(max(1, NBLOCKS_CAP // len(haps_rows)) * block_b,
                      ROWS_CAP)
            subgroups = [rids[i:i + sub] for i in range(0, n_read, sub)]
        else:
            subgroups = [rids]
        for rids_sub in subgroups:
            n_read = len(rids_sub)
            n_tiles = -(-n_read // block_b)
            need_blocks = n_tiles * len(haps_rows)
            need_rows = n_tiles * block_b
            new_haps = [h for h in haps_rows if h not in st["row_of_hap"]]
            if (len(st["blocks"]) + need_blocks > NBLOCKS_CAP
                    or len(st["rows"]) + need_rows > ROWS_CAP
                    or len(st["row_of_hap"]) + len(new_haps) > HAPS_CAP):
                flush()
                new_haps = list(haps_rows)
            for h in new_haps:
                st["row_of_hap"][h] = len(st["row_of_hap"])
                st["hapset"].append((st["row_of_hap"][h], hap_list[h]))
            tile0 = len(st["rows"]) // block_b
            blk0 = len(st["blocks"])
            # read rows (pad the tile tail with copies of the first read)
            for rid in rids_sub:
                st["rows"].append(reads[rid]["data"])
            pad = n_tiles * block_b - n_read
            for _ in range(pad):
                st["rows"].append(reads[rids_sub[0]]["data"])
            # blocks in (tile-major, hap-minor) order
            for t in range(n_tiles):
                for h in haps_rows:
                    st["blocks"].append((tile0 + t, st["row_of_hap"][h]))
            # output positions, vectorized: pair k of read-row i with hap
            # j lands in block blk0 + (i // block_b) * n_haps + j at row
            # i % block_b (duplicate (read, hap) tuples in the input all
            # map to the same computed cell)
            jmap = {h: j for j, h in enumerate(haps_rows)}
            ks_l, js_l, rr_l = [], [], []
            for i, rid in enumerate(rids_sub):
                ent = reads[rid]
                for hh, k in zip(ent["haps"], ent["ks"]):
                    ks_l.append(k)
                    js_l.append(jmap[hh])
                    rr_l.append(i)
            if ks_l:
                rr = np.asarray(rr_l, np.int64)
                blk = (blk0 + (rr // block_b) * len(haps_rows)
                       + np.asarray(js_l, np.int64))
                out_pos[np.asarray(ks_l, np.int64)] = (
                    dispatch_base() + blk * block_b + rr % block_b)
    flush()
    return dispatches, out_pos, Rpad, nchunks


# ---------- wire compression for grouped dispatches ----------
#
# The grouped layout already ships each read/hap once; on the tunneled
# backend (~45-80 MB/s H2D) the remaining per-position cost is 5 bytes of
# read planes + 1 byte of hap stream.  Both are highly structured:
# - bases draw from a tiny alphabet (BAM itself stores 4-bit codes), so
#   read+hap planes pack to 4-bit symbol nibbles against a per-process
#   symbol table;
# - the (q, iq, dq, gcp) qual tuple at each position takes few distinct
#   values (defaults + PCR-model adjustments + pads), so the four planes
#   collapse to ONE u8 codebook index per position.
# Net: ~1.5 bytes/position + 0.5 bytes/hap-base instead of 5 + 1 — ~3.6x
# fewer wire bytes.  Decode runs on-device in the jit prologue (nibble
# unpack + 16-way select + one 256-entry u32 gather) and reproduces the
# exact flat planes, so the Pallas kernel and its numerics are untouched.
# Dispatches whose data overflow the tables (>16 symbols / >256 tuples)
# fall back to the flat layout.

_SYM_CAP = 16
#: "auto" (default): compress unless the measured H2D link is truly
#: local-PCIe fast (> ~2 GB/s).  Measured crossover: at 956 MB/s the
#: wire path still beat flat by ~9% (per-put fixed costs favour fewer,
#: smaller operands), and the ~8 ms/dispatch host encode only outweighs
#: the byte cut when transfers are nearly free.  "1"/"0" force on/off.
_WIRE_COMPRESS = os.environ.get("LORIKEET_WIRE_COMPRESS", "auto")
_LINK_BPS = [None]


def _link_bps() -> float:
    """One-shot measured H2D rate (device_put of 4 MB, best of 2)."""
    if _LINK_BPS[0] is None:
        try:
            import time as _t
            buf = np.zeros(4 << 20, np.uint8)
            best = np.inf
            for _ in range(2):
                t0 = _t.perf_counter()
                jax.block_until_ready(jnp.asarray(buf))
                best = min(best, _t.perf_counter() - t0)
            _LINK_BPS[0] = len(buf) / max(best, 1e-6)
        except Exception:  # noqa: BLE001 — no device: rate is moot
            _LINK_BPS[0] = 0.0
    return _LINK_BPS[0]


def _wire_enabled() -> bool:
    if _WIRE_COMPRESS == "auto":
        bps = _link_bps()
        return bool(bps) and bps < 2e9
    return _WIRE_COMPRESS != "0"


class _SortedCodeCache:
    """Incremental sorted value->index cache: encoding is a searchsorted
    against known keys (new values extend the key set); the per-dispatch
    codebook ships the full key table.  Misses beyond `cap` disable the
    encoding for that dispatch."""

    def __init__(self, cap, dtype):
        self.cap = cap
        self.keys = np.zeros(1, dtype)      # 0 = the pad value

    def encode(self, flat):
        pos = np.searchsorted(self.keys, flat)
        hit = self.keys[np.minimum(pos, self.keys.size - 1)] == flat
        if not hit.all():
            new = np.unique(flat[~hit])
            keys = np.union1d(self.keys, new)
            if keys.size > self.cap:
                return None
            self.keys = keys
            pos = np.searchsorted(self.keys, flat)
        return pos

    def table(self):
        t = np.zeros(self.cap, self.keys.dtype)
        t[:self.keys.size] = self.keys
        return t


_qual_codes = _SortedCodeCache(256, np.uint32)
_base_codes = _SortedCodeCache(_SYM_CAP, np.uint8)


def _nibble_pack(syms):
    return (syms[:, 0::2] | (syms[:, 1::2] << 4)).astype(np.uint8)


def _compress_dispatch(operands, used=None, wire=None):
    """(mode, payload): 'wire' ships (qidx, base_nib, hap_nib, cb,
    sym_tab, lens); 'flat' ships the original planes.  ``used`` is the
    (n_rows, n_haps) actually filled — pad rows/haps are all-zero and
    encode to code 0 / symbol 0 by construction (both caches hold key 0
    at index 0), so only the used slices pay encode cost.  ``wire``
    overrides the auto link-rate gate (pool workers force it: their own
    'link' is host RAM, but the jobs execute over the PARENT's)."""
    if not (_wire_enabled() if wire is None else wire):
        return "flat", operands
    q, iqp, dqp, gqp, rdp, hap_u8, lens = operands
    rows, Rpad = q.shape
    n_rows, n_haps = used if used is not None else (rows, hap_u8.shape[0])
    ru, hu = rdp[:n_rows], hap_u8[:n_haps]
    sy = _base_codes.encode(np.concatenate([ru.ravel(), hu.ravel()]))
    if sy is None:
        return "flat", operands
    base_nib = np.zeros((rows, Rpad // 2), np.uint8)
    hap_nib = np.zeros((hap_u8.shape[0], hap_u8.shape[1] // 2), np.uint8)
    base_nib[:n_rows] = _nibble_pack(
        sy[:ru.size].reshape(ru.shape).astype(np.uint8))
    hap_nib[:n_haps] = _nibble_pack(
        sy[ru.size:].reshape(hu.shape).astype(np.uint8))
    # (q, iq, dq, gcp) tuples as one u32 view — interleave once, no
    # per-plane u32 temporaries
    arr = np.ascontiguousarray(
        np.stack([q[:n_rows], iqp[:n_rows], dqp[:n_rows], gqp[:n_rows]],
                 axis=-1)).view(np.uint32)[..., 0]
    qc = _qual_codes.encode(arr.ravel())
    if qc is None:
        return "flat", operands
    qidx = np.zeros((rows, Rpad), np.uint8)
    qidx[:n_rows] = qc.astype(np.uint8).reshape(n_rows, Rpad)
    return "wire", (qidx, base_nib, hap_nib,
                    _qual_codes.table(), _base_codes.table(), lens)


def _grouped_wire_call(tile_tab, hap_tab, hoff_tab, hlen_tab, qidx,
                       base_nib, hap_nib, cb, sym_tab, lens, nchunks,
                       block_b, interpret):
    """Decode the wire format back to the exact flat planes, then run the
    unchanged grouped kernel (decode cost is trivial vs the DP sweep)."""
    def unnib(p):
        lo = p & np.uint8(0xF)
        hi = p >> np.uint8(4)
        return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)

    def sym2byte(s):
        out = jnp.zeros(s.shape, jnp.uint8)
        for i in range(_SYM_CAP):
            out = jnp.where(s == i, sym_tab[i], out)
        return out

    read_u8 = sym2byte(unnib(base_nib))
    hap_u8 = sym2byte(unnib(hap_nib))
    v = jnp.take(cb, qidx.astype(jnp.int32))
    q = (v & 0xFF).astype(jnp.uint8)
    iq = ((v >> 8) & 0xFF).astype(jnp.uint8)
    dq = ((v >> 16) & 0xFF).astype(jnp.uint8)
    gq = ((v >> 24) & 0xFF).astype(jnp.uint8)
    return _grouped_call(tile_tab, hap_tab, hoff_tab, hlen_tab, q, iq, dq,
                         gq, read_u8, hap_u8, lens, nchunks, block_b,
                         interpret)


_grouped_wire_jit = functools.partial(
    jax.jit, static_argnames=("nchunks", "block_b", "interpret"))(
        _grouped_wire_call)


def pack_pairs_ipc(pairs):
    """Consolidate a pair batch for cross-process transport: unique reads'
    five arrays concatenate into five buffers + one offset table, unique
    haps into one buffer + offsets, and per-pair (hap, read) index arrays
    — ~10 large picklable objects instead of six numpy pickles PER PAIR
    (a 8k-pair span batch costs ~100 ms of pickle churn in the flat
    form).  unpack_pairs_ipc rebuilds views that preserve the shared
    read/hap identities the grouped dispatch dedups on."""
    hap_of, hap_list = {}, []
    read_of, read_list = {}, []
    hi_l, ri_l = [], []
    for hap, read, q, iq, dq, gcp in pairs:
        h = hap_of.get(id(hap))
        if h is None:
            h = hap_of[id(hap)] = len(hap_list)
            hap_list.append(hap)
        r = read_of.get(id(read))
        if r is None:
            r = read_of[id(read)] = len(read_list)
            read_list.append((read, q, iq, dq, gcp))
        hi_l.append(h)
        ri_l.append(r)
    u8z = np.zeros(0, np.uint8)
    hap_off = np.zeros(len(hap_list) + 1, np.int64)
    np.cumsum([len(h) for h in hap_list], out=hap_off[1:])
    hap_buf = np.concatenate(hap_list) if hap_list else u8z
    r_off = np.zeros(len(read_list) + 1, np.int64)
    np.cumsum([len(r[0]) for r in read_list], out=r_off[1:])
    bufs = tuple(
        (np.concatenate([r[j] for r in read_list]) if read_list else u8z)
        for j in range(5))
    return (hap_buf, hap_off, bufs, r_off,
            np.asarray(hi_l, np.int32), np.asarray(ri_l, np.int32))


def unpack_pairs_ipc(payload):
    hap_buf, hap_off, bufs, r_off, hi, ri = payload
    hap_views = [hap_buf[hap_off[i]:hap_off[i + 1]]
                 for i in range(len(hap_off) - 1)]
    read_views = [tuple(b[r_off[i]:r_off[i + 1]] for b in bufs)
                  for i in range(len(r_off) - 1)]
    return [(hap_views[h],) + read_views[r]
            for h, r in zip(hi.tolist(), ri.tolist())]


def pairhmm_forward_grouped(pairs, block_b: int = GROUP_BLOCK_B,
                            interpret: bool = False,
                            devices=None, wire=None) -> np.ndarray:
    """Forward log10 likelihoods for a flat pair list via the grouped
    (read-tile x hap) dispatch path.  Bit-compatible with
    pairhmm_forward_pallas (same DP sweep); ships each read/hap once.

    ``devices``: optional device list — dispatches are independent (no
    collectives), so they round-robin across devices and execute
    concurrently (the reference's rayon region fan-out,
    assembly_region_walker.rs:139-141, as whole dispatches per chip).
    All outputs are enqueued before the first readback."""
    jobs, out_pos, nchunks = prepare_grouped_jobs(pairs, block_b, wire=wire)
    flat = execute_grouped_jobs(jobs, nchunks, block_b, interpret, devices)
    return flat[out_pos]


def prepare_grouped_jobs(pairs, block_b: int = GROUP_BLOCK_B, wire=None):
    """Host-side half of the grouped dispatch: pack + (maybe) compress.
    Returns (jobs, out_pos, nchunks) where each job is (tables, mode,
    arrays) ready for execute_grouped_jobs — in the pool, the WORKER runs
    this half (it replaces the worker's own kernel time) and ships the
    job arrays, so the parent's service thread never burns a core on
    packing."""
    dispatches, out_pos, Rpad, nchunks = pack_grouped_inputs(pairs, block_b)
    jobs = []
    for tables, operands, used in dispatches:
        mode, payload = _compress_dispatch(operands, used, wire=wire)
        jobs.append((tables, mode, payload))
    return jobs, out_pos, nchunks


def execute_grouped_jobs(jobs, nchunks: int, block_b: int = GROUP_BLOCK_B,
                         interpret: bool = False, devices=None):
    """Device half: puts + jit calls + one readback; returns the flat
    per-row results (index with the out_pos from prepare_grouped_jobs)."""
    outs = []
    for di, (tables, mode, payload) in enumerate(jobs):
        dev = devices[di % len(devices)] if devices else None
        put = (lambda x: jax.device_put(np.asarray(x), dev)) if dev \
            else jnp.asarray
        tabs = tuple(put(t) for t in tables)
        args = tuple(put(a) for a in payload)
        fn = _grouped_wire_jit if mode == "wire" else _grouped_jit
        outs.append(fn(*tabs, *args, nchunks, block_b, interpret))
    if len(outs) == 1:
        flat = np.asarray(outs[0])
    else:
        # read back per-dispatch (device-hosted arrays cannot concatenate
        # lazily across devices); enqueue completed above, so readbacks
        # pipeline
        flat = np.concatenate([np.asarray(o) for o in outs], axis=0)
    return flat[:, 0]


def enqueue_grouped_jobs(jobs, nchunks: int, block_b: int = GROUP_BLOCK_B,
                         interpret: bool = False):
    """Enqueue-only variant (no readback): returns the device handles.
    Used by the service's in-flight pipeline and its depth probe."""
    outs = []
    for tables, mode, payload in jobs:
        tabs = tuple(jnp.asarray(t) for t in tables)
        args = tuple(jnp.asarray(a) for a in payload)
        fn = _grouped_wire_jit if mode == "wire" else _grouped_jit
        outs.append(fn(*tabs, *args, nchunks, block_b, interpret))
    return outs


def readback_grouped(outs):
    if len(outs) == 1:
        return np.asarray(outs[0])[:, 0]
    return np.concatenate([np.asarray(o) for o in outs], axis=0)[:, 0]
