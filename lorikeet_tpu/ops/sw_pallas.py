"""Pallas TPU kernel for batched Smith-Waterman affine-gap alignment.

Semantics contract: /root/reference/src/smith_waterman/smith_waterman_aligner.rs
:124-263 (matrix + backtrack with the linear-gap running-max optimization and
priority diag >= right >= down) and :273-442 (traceback with the four overhang
strategies).  Exact integer DP — results are bit-identical to the scalar
aligner (ops.smith_waterman.align / native/sw.cpp), verified pairwise in
tests/test_sw_pallas.py.

Design (same wavefront family as ops/pairhmm_pallas.py):
- lane axis = reference position i (the DP row), anti-diagonal sweep d=i+j;
  the alternate sequence enters at lane 0 and rides the diagonal through a
  per-step roll, exactly like the pair-HMM hap stream.
- the backtrack value of every cell (0 diag, +k vertical gap of length k,
  -k horizontal gap) is streamed to HBM diag-major: cell (i,j) lives at flat
  offset (i+j-1)*Rpad + i.  The per-cell gap LENGTH is stored (reference
  btrack semantics) so the traceback jumps whole gap runs.
- per-diagonal last-column / last-row scores are emitted as [B, ndiag]
  streams so the traceback start (argmax over the final column/row with the
  reference's tie rules) is computed on host from O(ndiag) data instead of
  the full matrix.
- traceback runs on device as one jitted while_loop over the HBM backtrack
  stream (batched gathers), emitting run-length (state, length) pairs; the
  tiny strategy-specific head/tail assembly happens on host.

The running-max recurrences map onto the wavefront as:
  best_gap_v[j] (column-wise over i) rides the diagonal -> lane shift;
  best_gap_h[i] (row-wise over j) is lane-static.
Inactive lanes are forced to (sw=0, gaps=LOW) every step so pre-activation
garbage can never leak into a real cell through the running maxes.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lorikeet_tpu.ops.smith_waterman import (
    MATRIX_MIN_CUTOFF, OverhangStrategy, SWParameters, _CIGAR_OPS, _to_bytes,
    align,
)

_LANES = 128
_TB = 8              # batch rows per grid step (int32 sublane tile)
_SLAB = 128          # fixed batch slab: one compiled shape per size bucket
_LOW = -(2 ** 30)    # LOW_INIT analogue (int32-safe under extend drift)
_MIN32 = -(2 ** 31) + 1
_K_RUNS = 96         # run-length emission capacity per pair


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(ref_pad, alt_stream, lens, bt_out, lc_out, lr_out,
            swd1, swd2, bgv, gsv, bgh, gsh, altd,
            *, w_match, w_mis, w_open, w_ext, indel_init, Rpad):
    i32 = jnp.int32
    c = pl.program_id(1)
    TB = ref_pad.shape[0]
    lane = jax.lax.broadcasted_iota(i32, (TB, Rpad), 1)
    lane128 = jax.lax.broadcasted_iota(i32, (TB, _LANES), 1)
    boundary = lane == 0

    def col(x, idx):
        # masked-reduction column extract (lane-replicated [TB,1]); direct
        # lane slices break Mosaic relayout when broadcast (see pairhmm).
        it = jax.lax.broadcasted_iota(i32, x.shape, 1)
        return jnp.sum(jnp.where(it == idx, x, 0), axis=1, keepdims=True)

    lens_v = lens[...]
    ref_len = jnp.broadcast_to(col(lens_v, 0), (TB, Rpad))
    alt_len = jnp.broadcast_to(col(lens_v, 1), (TB, Rpad))

    @pl.when(c == 0)
    def _init():
        z = jnp.zeros((TB, Rpad), i32)
        swd1[...] = z
        swd2[...] = z
        bgv[...] = jnp.full((TB, Rpad), _LOW, i32)
        gsv[...] = z
        bgh[...] = jnp.full((TB, Rpad), _LOW, i32)
        gsh[...] = z
        altd[...] = z

    window = alt_stream[:, pl.ds(pl.multiple_of(c * _LANES, _LANES), _LANES)]
    if Rpad > _LANES:
        window = jnp.concatenate(
            [window, jnp.zeros((TB, Rpad - _LANES), window.dtype)], 1)

    def shift(x, fill):
        rolled = pltpu.roll(x, 1, 1)
        return jnp.where(boundary, fill, rolled)

    rp = ref_pad[...]

    def body(s, carry):
        s1, s2, bv, gv, bh, gh, ad, win, lc, lr = carry
        d = c * _LANES + s + 1
        # entering alt base alt[d-1] at lane 0; rides one lane per diagonal
        ad = jnp.where(boundary, win, pltpu.roll(ad, 1, 1))
        win = pltpu.roll(win, Rpad - 1, 1)

        j_here = d - lane
        active = (lane >= 1) & (lane <= ref_len) & (j_here >= 1) \
            & (j_here <= alt_len)

        # diag: sw(i-1, j-1) on diagonal d-2, lane i-1
        step_diag = shift(s2, 0) + jnp.where(rp == ad, w_match, w_mis)

        # vertical gap (down): column running max rides the diagonal
        prev_gap_v = shift(s1, 0) + w_open        # sw(i-1, j) + open
        bv_ext = shift(bv, _LOW) + w_ext
        open_v = prev_gap_v > bv_ext
        step_down = jnp.maximum(prev_gap_v, bv_ext)
        kd = jnp.where(open_v, 1, shift(gv, 0) + 1)

        # horizontal gap (right): row running max is lane-static
        prev_gap_h = s1 + w_open                  # sw(i, j-1) + open
        bh_ext = bh + w_ext
        open_h = prev_gap_h > bh_ext
        step_right = jnp.maximum(prev_gap_h, bh_ext)
        ki = jnp.where(open_h, 1, gh + 1)

        # priority diag >= right >= down (smith_waterman_aligner.rs:199-214)
        take_diag = (step_diag >= step_down) & (step_diag >= step_right)
        take_right = (~take_diag) & (step_right >= step_down)
        chosen = jnp.where(take_diag, step_diag,
                           jnp.where(take_right, step_right, step_down))
        btr = jnp.where(take_diag, 0, jnp.where(take_right, -ki, kd))
        val = jnp.maximum(jnp.int32(MATRIX_MIN_CUTOFF), chosen)

        new_s = jnp.where(active, val, 0)
        # boundary injections: row 0 (lane 0) and column 0 (lane d) hold the
        # strategy-dependent init (0, or the INDEL open+extend ramp)
        if indel_init:
            v0 = w_open + (d - 1) * w_ext
        else:
            v0 = 0
        new_s = jnp.where(boundary | (lane == d), v0, new_s)

        # emissions
        bt_out[:, pl.ds(pl.multiple_of(s * Rpad, _LANES), Rpad)] = \
            jnp.where(active, btr, 0)
        lc_val = jnp.max(jnp.where(active & (j_here == alt_len), new_s,
                                   _MIN32), axis=1, keepdims=True)
        lr_val = jnp.max(jnp.where(active & (lane == ref_len), new_s,
                                   _MIN32), axis=1, keepdims=True)
        lc = jnp.where(lane128 == s, jnp.broadcast_to(lc_val, (TB, _LANES)),
                       lc)
        lr = jnp.where(lane128 == s, jnp.broadcast_to(lr_val, (TB, _LANES)),
                       lr)

        bv_n = jnp.where(active, step_down, _LOW)
        gv_n = jnp.where(active, kd, 0)
        bh_n = jnp.where(active, step_right, _LOW)
        gh_n = jnp.where(active, ki, 0)
        return (new_s, s1, bv_n, gv_n, bh_n, gh_n, ad, win, lc, lr)

    carry = (swd1[...], swd2[...], bgv[...], gsv[...], bgh[...], gsh[...],
             altd[...], window,
             jnp.full((TB, _LANES), _MIN32, i32),
             jnp.full((TB, _LANES), _MIN32, i32))
    carry = jax.lax.fori_loop(0, _LANES, body, carry)
    swd1[...], swd2[...], bgv[...], gsv[...], bgh[...], gsh[...], altd[...] \
        = carry[:7]
    lc_out[...] = carry[8]
    lr_out[...] = carry[9]


def _sw_pallas_dp(ref_pad, alt_stream, lens, params, indel_init, nchunks,
                  Rpad, interpret):
    B = ref_pad.shape[0]
    w_match, w_mis, w_open, w_ext = params
    grid = (B // _TB, nchunks)
    kern = functools.partial(
        _kernel, w_match=w_match, w_mis=w_mis, w_open=w_open, w_ext=w_ext,
        indel_init=indel_init, Rpad=Rpad)
    row = lambda b, c: (b, 0)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, Rpad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, alt_stream.shape[1]), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, _LANES), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TB, _LANES * Rpad), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, _LANES), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, _LANES), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nchunks * _LANES * Rpad), jnp.int32),
            jax.ShapeDtypeStruct((B, nchunks * _LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, nchunks * _LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((_TB, Rpad), jnp.int32)] * 7,
        interpret=interpret,
    )(ref_pad, alt_stream, lens)
    return out


def _start_points_jnp(lc, lr, ref_lens, alt_lens, strategy):
    """Device traceback-start selection (calculate_cigar :288-327): best
    final-column row (>= keeps the later i), then — unless LEADING_INDEL —
    the final row with 'greater, or equal and closer to the corner' tie
    semantics (earliest j wins distance ties).  Cell (i, j) sits at diag
    column i + j - 1 of the lc/lr streams."""
    i32 = jnp.int32
    B, ndiag = lc.shape
    rl = ref_lens[:, None]
    al = alt_lens[:, None]
    if strategy == OverhangStrategy.INDEL:
        z = jnp.zeros((B,), i32)
        return ref_lens, alt_lens, z
    g = jax.lax.broadcasted_iota(i32, (B, ndiag), 1)
    i_col = g - al + 1
    colv = jnp.where((i_col >= 1) & (i_col <= rl), lc, _MIN32)
    m0 = jnp.max(colv, axis=1)
    p1 = jnp.max(jnp.where(colv == m0[:, None], i_col, 0), axis=1)
    p2 = alt_lens
    seg0 = jnp.zeros((B,), i32)
    if strategy == OverhangStrategy.LEADING_INDEL:
        return p1, p2, seg0
    j_row = g - rl + 1
    candv = (j_row >= 1) & (j_row <= al)
    rowv = jnp.where(candv, lr, _MIN32)
    mstar = jnp.max(rowv, axis=1)
    cand = candv & (rowv == mstar[:, None])
    dist = jnp.abs(rl - j_row)
    big = jnp.int32(2 ** 30)
    dstar = jnp.min(jnp.where(cand, dist, big), axis=1)
    # min distance, earliest-j tie: lexicographic (dist, j) key
    key = jnp.where(cand, dist * (ndiag + 2) + j_row, big)
    jstar = jnp.min(key, axis=1) % (ndiag + 2)
    take = (mstar > m0) | ((mstar == m0) & (dstar < jnp.abs(p1 - p2)))
    p1 = jnp.where(take, ref_lens, p1)
    p2 = jnp.where(take, jstar, p2)
    seg0 = jnp.where(take, alt_lens - jstar, 0)
    return p1, p2, seg0


def _traceback_device(bt, p1_0, p2_0, seg_0, Rpad, K, max_steps):
    """Vectorized reference traceback (smith_waterman_aligner.rs:352-442
    main loop): batched gathers over the diag-major backtrack stream, runs
    emitted on state change.  Returns per-pair run arrays plus the final
    (state, segment, p1, p2) for the host's strategy tail."""
    B = bt.shape[0]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

    def cond(st):
        it, done = st[0], st[8]
        return (it < max_steps) & jnp.any(~done)

    def step(st):
        (it, p1, p2, state, seg, ops, lens_, cnt, done, over) = st
        idx = (p1 + p2 - 1) * Rpad + p1
        btr = jnp.take_along_axis(bt, idx[:, None], axis=1)[:, 0]
        is_del = btr > 0
        is_ins = btr < 0
        new_state = jnp.where(is_del, 2, jnp.where(is_ins, 1, 0))
        step_len = jnp.where(is_del, btr, jnp.where(is_ins, -btr, 1))
        p1n = jnp.where(is_ins, p1, jnp.where(is_del, p1 - step_len, p1 - 1))
        p2n = jnp.where(is_del, p2, jnp.where(is_ins, p2 - step_len, p2 - 1))
        same = new_state == state
        emit = (~same) & (seg > 0) & (~done)
        sel = emit[:, None] & (kcol == cnt[:, None])
        ops = jnp.where(sel, state[:, None], ops)
        lens_ = jnp.where(sel, seg[:, None], lens_)
        cntn = jnp.where(emit, cnt + 1, cnt)
        over = over | (emit & (cnt >= K))
        segn = jnp.where(same, seg + step_len, step_len)
        upd = ~done
        p1 = jnp.where(upd, p1n, p1)
        p2 = jnp.where(upd, p2n, p2)
        state = jnp.where(upd, new_state, state)
        seg = jnp.where(upd, segn, seg)
        cnt = jnp.where(upd, cntn, cnt)
        done = done | (p1 <= 0) | (p2 <= 0)
        return (it + 1, p1, p2, state, seg, ops, lens_, cnt, done, over)

    z = jnp.zeros((B,), jnp.int32)
    st = (jnp.int32(0), p1_0, p2_0, z, seg_0,
          jnp.zeros((B, K), jnp.int32), jnp.zeros((B, K), jnp.int32),
          z, jnp.zeros((B,), bool), jnp.zeros((B,), bool))
    st = jax.lax.while_loop(cond, step, st)
    (_, p1, p2, state, seg, ops, lens_, cnt, _, over) = st
    return ops, lens_, cnt, state, seg, p1, p2, over


_STATE_OP = {0: "M", 1: "I", 2: "D"}


@functools.partial(jax.jit, static_argnames=(
    "params", "strategy", "nchunks", "Rpad", "interpret"))
def _sw_full_jit(ref_pad, alt_stream, lens, params, strategy, nchunks, Rpad,
                 interpret):
    """Fused DP + start-point selection + traceback: one device program,
    one packed [B, 2K+8] int32 result (one host round-trip per bucket —
    the axon tunnel charges ~27 ms per transfer)."""
    indel_init = strategy in (OverhangStrategy.INDEL,
                              OverhangStrategy.LEADING_INDEL)
    bt, lc, lr = _sw_pallas_dp(ref_pad, alt_stream, lens, params, indel_init,
                               nchunks, Rpad, interpret)
    ref_lens = lens[:, 0]
    alt_lens = lens[:, 1]
    p1_0, p2_0, seg0 = _start_points_jnp(lc, lr, ref_lens, alt_lens, strategy)
    dev_seg0 = seg0 if strategy == OverhangStrategy.IGNORE \
        else jnp.zeros_like(seg0)
    ops, lens_r, cnt, fstate, fseg, fp1, fp2, over = _traceback_device(
        bt, p1_0, p2_0, dev_seg0, Rpad, _K_RUNS, nchunks * _LANES + 2)
    tail = jnp.stack([cnt, fstate, fseg, fp1, fp2,
                      over.astype(jnp.int32), seg0,
                      jnp.zeros_like(cnt)], axis=1)
    return jnp.concatenate([ops, lens_r, tail], axis=1)


def _assemble(runs_ops, runs_lens, cnt, fstate, fseg, fp1, fp2, seg0,
              strategy):
    """Host tail: mirror of calculate_cigar :329-442 around the device
    run-length emissions (which arrive end-to-start)."""
    lce = []
    if strategy == OverhangStrategy.SOFTCLIP and seg0 > 0:
        lce.append(("S", int(seg0)))
    for k in range(int(cnt)):
        lce.append((_STATE_OP[int(runs_ops[k])], int(runs_lens[k])))
    st = _STATE_OP[int(fstate)]
    if strategy == OverhangStrategy.SOFTCLIP:
        lce.append((st, int(fseg)))
        if fp2 > 0:
            lce.append(("S", int(fp2)))
        offset = int(fp1)
    elif strategy == OverhangStrategy.IGNORE:
        lce.append((st, int(fseg) + int(fp2)))
        offset = int(fp1) - int(fp2)
    else:
        lce.append((st, int(fseg)))
        if fp1 > 0:
            lce.append(("D", int(fp1)))
        elif fp2 > 0:
            lce.append(("I", int(fp2)))
        offset = 0
    lce.reverse()
    return [(op, n) for op, n in lce], offset


# ref_len+1 padded to lanes; caps the VMEM output block at 8*128*2048*4 = 8MB
MAX_REF_LANES = 2048


def align_batch_pallas(pairs, parameters: SWParameters,
                       overhang_strategy: int = OverhangStrategy.SOFTCLIP,
                       interpret: bool | None = None):
    """Batched (cigar, offset) via the Pallas kernel; one entry per
    (reference, alternate) pair.  Bit-identical to ops.smith_waterman.align
    (including the exact-substring shortcut); pairs that exceed the kernel's
    shape or run-capacity limits fall back to the scalar aligner.
    ``interpret=None`` auto-selects interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = len(pairs)
    results = [None] * n
    todo = []
    for k, (ref, alt) in enumerate(pairs):
        ref_b, alt_b = _to_bytes(ref), _to_bytes(alt)
        assert ref_b and alt_b, "non-empty sequences required"
        if overhang_strategy in (OverhangStrategy.SOFTCLIP,
                                 OverhangStrategy.IGNORE):
            idx = ref_b.rfind(alt_b)
            if idx >= 0:
                results[k] = ([("M", len(alt_b))], idx)
                continue
        if len(ref_b) + 1 > MAX_REF_LANES:
            results[k] = align(ref_b, alt_b, parameters, overhang_strategy)
            continue
        todo.append((k, ref_b, alt_b))

    # bucket by (Rpad, nchunks) to bound compile diversity
    buckets = {}
    for item in todo:
        _, ref_b, alt_b = item
        Rpad = _round_up(len(ref_b) + 1, _LANES)
        nchunks = max(1, -(-(len(ref_b) + len(alt_b)) // _LANES))
        buckets.setdefault((Rpad, nchunks), []).append(item)

    params = (parameters.match_value, parameters.mismatch_penalty,
              parameters.gap_open_penalty, parameters.gap_extend_penalty)
    for (Rpad, nchunks), items in buckets.items():
        for lo in range(0, len(items), _SLAB):
            chunk = items[lo:lo + _SLAB]
            _run_bucket(chunk, results, Rpad, nchunks, params,
                        overhang_strategy, parameters, interpret)
    return results


def _run_bucket(items, results, Rpad, nchunks, params, strategy,
                parameters, interpret):
    B = _SLAB
    Spad = nchunks * _LANES
    ref_pad = np.zeros((B, Rpad), np.int32)
    alt_stream = np.zeros((B, Spad), np.int32)
    lens = np.ones((B, _LANES), np.int32)
    for r, (_, ref_b, alt_b) in enumerate(items):
        ref_pad[r, 1:len(ref_b) + 1] = np.frombuffer(ref_b, np.uint8)
        alt_stream[r, :len(alt_b)] = np.frombuffer(alt_b, np.uint8)
        lens[r, 0] = len(ref_b)
        lens[r, 1] = len(alt_b)

    packed = np.asarray(_sw_full_jit(
        jnp.asarray(ref_pad), jnp.asarray(alt_stream), jnp.asarray(lens),
        params, strategy, nchunks, Rpad, interpret))
    ops = packed[:, :_K_RUNS]
    lens_r = packed[:, _K_RUNS:2 * _K_RUNS]
    cnt, fstate, fseg, fp1, fp2, over, seg0 = \
        (packed[:, 2 * _K_RUNS + t] for t in range(7))
    for r, (k, ref_b, alt_b) in enumerate(items):
        if over[r]:
            results[k] = align(ref_b, alt_b, parameters, strategy)
        else:
            results[k] = _assemble(
                ops[r], lens_r[r], cnt[r], fstate[r], fseg[r], fp1[r],
                fp2[r], seg0[r], strategy)
