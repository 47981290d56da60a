"""Pallas pair-HMM kernel tests (interpret mode on CPU).

The compiled path is validated on real TPU hardware (30 GCUPS sustained,
golden max err 3.3e-5) — interpret mode is far too slow for the full golden
set, so here a handful of small synthetic cases check the kernel logic
(padding, masking, hap streaming) against the exact numpy reference.
"""
import numpy as np
import pytest

from lorikeet_tpu.ops.pairhmm import pairhmm_forward_np
from lorikeet_tpu.ops.pairhmm_pallas import pairhmm_forward_pallas


@pytest.mark.slow
def test_pallas_interpret_small():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    for H, R in [(40, 20), (33, 17), (64, 30), (50, 50)]:
        hap = bases[rng.integers(0, 4, H)]
        read = hap[5:5 + R].copy() if H - 5 >= R else bases[rng.integers(0, 4, R)]
        read[rng.integers(0, R)] = bases[rng.integers(0, 4)]
        q = rng.integers(6, 40, R).astype(np.uint8)
        iq = rng.integers(30, 46, R).astype(np.uint8)
        dq = rng.integers(30, 46, R).astype(np.uint8)
        gcp = np.full(R, 10, np.uint8)
        pairs.append((hap, read, q, iq, dq, gcp))

    B = len(pairs)
    Hmax = max(len(p[0]) for p in pairs)
    Rmax = max(len(p[1]) for p in pairs)
    batch = dict(
        haps=np.zeros((B, Hmax), np.uint8), hap_lens=np.zeros(B, np.int32),
        reads=np.zeros((B, Rmax), np.uint8), read_lens=np.zeros(B, np.int32),
        quals=np.zeros((B, Rmax), np.uint8), ins_quals=np.zeros((B, Rmax), np.uint8),
        del_quals=np.zeros((B, Rmax), np.uint8), gcps=np.zeros((B, Rmax), np.uint8),
    )
    for k, (hap, read, q, iq, dq, gcp) in enumerate(pairs):
        batch["haps"][k, :len(hap)] = hap
        batch["hap_lens"][k] = len(hap)
        batch["reads"][k, :len(read)] = read
        batch["read_lens"][k] = len(read)
        batch["quals"][k, :len(q)] = q
        batch["ins_quals"][k, :len(iq)] = iq
        batch["del_quals"][k, :len(dq)] = dq
        batch["gcps"][k, :len(gcp)] = gcp

    from lorikeet_tpu.ops.pairhmm import pairhmm_forward_checked
    raw = np.asarray(pairhmm_forward_pallas(**batch, interpret=True, block_b=8))
    got = pairhmm_forward_checked(raw, pairs)
    for k, p in enumerate(pairs):
        want = pairhmm_forward_np(*p)
        assert abs(got[k] - want) < 2e-3, (k, want, got[k])


def test_pallas_interpret_long_reads_multilane():
    """R > 127 pads the lane axis to 256: exercises the padded-window
    entering-base path (kernel chunk_body zero-pad) and nchunks > 1."""
    import numpy as np
    from lorikeet_tpu.ops.pairhmm import pairhmm_forward_batch
    from lorikeet_tpu.ops.pairhmm_pallas import pairhmm_forward_pallas

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    for H, R in [(300, 150), (200, 151), (280, 140)]:
        hap = bases[rng.integers(0, 4, H)]
        read = hap[7:7 + R].copy()
        read[rng.integers(0, R)] = bases[rng.integers(0, 4)]
        q = rng.integers(10, 40, R).astype(np.uint8)
        iq = rng.integers(30, 46, R).astype(np.uint8)
        dq = rng.integers(30, 46, R).astype(np.uint8)
        gcp = np.full(R, 10, np.uint8)
        pairs.append((hap, read, q, iq, dq, gcp))
    Hmax = max(len(p[0]) for p in pairs)
    Rmax = max(len(p[1]) for p in pairs)
    B = len(pairs)
    haps = np.zeros((B, Hmax), np.uint8)
    reads = np.zeros((B, Rmax), np.uint8)
    quals = np.zeros((B, Rmax), np.uint8)
    iqs = np.zeros((B, Rmax), np.uint8)
    dqs = np.zeros((B, Rmax), np.uint8)
    gcps = np.zeros((B, Rmax), np.uint8)
    hl = np.zeros(B, np.int32)
    rl = np.zeros(B, np.int32)
    for k, (hap, read, q, iq, dq, gcp) in enumerate(pairs):
        haps[k, :len(hap)] = hap
        reads[k, :len(read)] = read
        quals[k, :len(read)] = q
        iqs[k, :len(read)] = iq
        dqs[k, :len(read)] = dq
        gcps[k, :len(read)] = gcp
        hl[k], rl[k] = len(hap), len(read)
    want = np.asarray(pairhmm_forward_batch(haps, hl, reads, rl, quals,
                                            iqs, dqs, gcps))
    got = np.asarray(pairhmm_forward_pallas(haps, hl, reads, rl, quals,
                                            iqs, dqs, gcps, interpret=True))
    np.testing.assert_allclose(got[:B], want[:B], atol=2e-3)


def test_pallas_interpret_ambiguous_bases():
    """N bases (all match bits) and IUPAC codes (distinct bits; byte-equality
    match like the reference, pair_hmm.rs:536-545) through the kernel's
    _BASE_BITS one-hot match, checked against the exact numpy reference —
    previously only the on-TPU golden runs exercised non-ACGT bytes."""
    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    # case 1: N in both read and hap (N matches everything)
    hap = bases[rng.integers(0, 4, 40)]
    read = hap[3:3 + 20].copy()
    hap[10] = ord("N")
    read[4] = ord("N")
    # case 2: IUPAC 'R' in hap vs 'A' in read (distinct bits: mismatch)
    hap2 = bases[rng.integers(0, 4, 36)]
    read2 = hap2[2:2 + 18].copy()
    hap2[8] = ord("R")
    read2[6] = ord("A")
    # case 3: IUPAC 'R' vs 'R' (byte equality: match) and 'R' vs 'N' (match)
    hap3 = bases[rng.integers(0, 4, 36)]
    read3 = hap3[1:1 + 18].copy()
    hap3[5] = ord("R")
    read3[4] = ord("R")
    hap3[12] = ord("N")
    read3[11] = ord("R")
    for h, r in [(hap, read), (hap2, read2), (hap3, read3)]:
        R = len(r)
        pairs.append((h, r,
                      rng.integers(10, 40, R).astype(np.uint8),
                      rng.integers(30, 46, R).astype(np.uint8),
                      rng.integers(30, 46, R).astype(np.uint8),
                      np.full(R, 10, np.uint8)))
    from lorikeet_tpu.ops.pairhmm import pack_pairhmm_batch
    batch = pack_pairhmm_batch(pairs)
    got = np.asarray(pairhmm_forward_pallas(**batch, interpret=True))
    for k, p in enumerate(pairs):
        want = pairhmm_forward_np(*p)
        assert abs(got[k] - want) < 2e-3, (k, want, got[k])


def test_vmem_block_always_divides_slab():
    """A non-divisor block would leave trailing slab rows unwritten (the
    Rpad=640 case produced block 51 over a 1024-row slab)."""
    from lorikeet_tpu.ops.pairhmm_pallas import B_SLAB, vmem_safe_block
    for rpad in range(128, 2049, 128):
        b = vmem_safe_block(rpad, 64)
        assert b > 0 and B_SLAB % b == 0, (rpad, b)
    assert vmem_safe_block(640, 64) == 32


@pytest.mark.slow
def test_pallas_interpret_ambiguous_bases():
    """N (read and hap sides), an IUPAC byte, and an unknown byte through
    the one-hot _BASE_BITS match in interpret mode vs the exact numpy
    reference — CPU-verifiable coverage for the non-ACGT buckets
    (pair_hmm.rs:536-545: match when equal or either side is N; non-N
    IUPAC codes compare by exact byte equality, not intersection)."""
    from lorikeet_tpu.ops.pairhmm import (pack_pairhmm_batch,
                                          pairhmm_forward_np)
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []

    # (a) N scattered through the READ: matches every hap base
    hap = bases[rng.integers(0, 4, 48)]
    read = hap[4:36].copy()
    read[[3, 10, 20]] = ord("N")
    # (b) N scattered through the HAP: matches every read base
    hap_n = bases[rng.integers(0, 4, 40)]
    hap_n[[7, 19]] = ord("N")
    read_b = hap_n[2:30].copy()
    read_b[5] = bases[2]
    # (c) IUPAC byte 'R': exact-equality match where both sides carry it,
    # mismatch against a plain base
    hap_r = bases[rng.integers(0, 4, 44)]
    hap_r[12] = ord("R")
    read_c = hap_r[6:34].copy()          # read[6] == 'R' aligns over hap 'R'
    read_c[15] = ord("R")                # 'R' over a plain base: mismatch
    # (d) unknown byte 'X' on both sides (same unknown byte == match) and
    # lowercase base (decoders upfold; kernel folds too)
    hap_x = bases[rng.integers(0, 4, 36)]
    hap_x[9] = ord("X")
    read_d = hap_x[3:27].copy()          # read[6] == 'X' over hap 'X'

    for hp, rd in [(hap, read), (hap_n, read_b), (hap_r, read_c),
                   (hap_x, read_d)]:
        R = len(rd)
        pairs.append((hp, rd,
                      rng.integers(10, 40, R).astype(np.uint8),
                      rng.integers(30, 46, R).astype(np.uint8),
                      rng.integers(30, 46, R).astype(np.uint8),
                      np.full(R, 10, np.uint8)))

    batch = pack_pairhmm_batch(pairs)
    got = np.asarray(pairhmm_forward_pallas(**batch, interpret=True,
                                            block_b=8))
    for k, p in enumerate(pairs):
        want = pairhmm_forward_np(*p)
        assert abs(got[k] - want) < 2e-3, (k, want, got[k])
    # the N-in-read pair must actually beat the same pair with mismatching
    # plain bases (sanity that N matched rather than mismatched)
    plain = list(pairs[0])
    rd = plain[1].copy()
    rd[[3, 10, 20]] = np.where(plain[0][[7, 14, 24]] == ord("A"),
                               ord("C"), ord("A")).astype(np.uint8)
    plain[1] = rd
    assert pairhmm_forward_np(*pairs[0]) > pairhmm_forward_np(*plain)


def test_grouped_duplicate_pairs_and_long_reads():
    """Duplicate (read, hap) tuples all receive the same output cell (the
    out_pos mapping must cover every matching pair), and a 3 kb long-read
    pair routes through the grouped path without shape errors; its deep
    negative lands in the f32-escalation zone exactly like the flat path."""
    import numpy as np

    from lorikeet_tpu.ops.pairhmm import F32_SUSPECT_LOG10, pairhmm_forward_np
    from lorikeet_tpu.ops.pairhmm_pallas import pairhmm_forward_grouped

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # 500bp "long" read: exercises the Rpad>128 / tiny-block shape path
    # at interpret-mode speed (a 3kb read takes ~8 min in interpret)
    hap = bases[rng.integers(0, 4, 700)]
    read = hap[100:600].copy()
    for _ in range(25):
        read[int(rng.integers(0, 500))] = bases[int(rng.integers(0, 4))]
    q = np.full(500, 30, np.uint8)
    o = np.full(500, 45, np.uint8)
    g = np.full(500, 10, np.uint8)
    pairs = [(hap, read, q, o, o, g)] * 3          # identical tuples
    got = pairhmm_forward_grouped(pairs, interpret=True)
    assert np.all(np.isfinite(got))
    assert np.allclose(got, got[0])                # same cell for all three
    want = pairhmm_forward_np(*pairs[0])
    # deep negative: both float paths flush; production escalates at -28
    assert want < F32_SUSPECT_LOG10 and got[0] < F32_SUSPECT_LOG10


def test_grouped_matches_flat_kernel():
    """Grouped dispatch is bit-identical to the flat slab kernel on the
    same pairs (shared _dp_sweep)."""
    import numpy as np

    from lorikeet_tpu.ops.pairhmm import pack_pairhmm_batch
    from lorikeet_tpu.ops.pairhmm_pallas import (
        pack_pallas_inputs, pairhmm_forward_grouped, pairhmm_forward_packed,
    )

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    for reg in range(3):
        H = int(rng.integers(150, 400))
        bh = bases[rng.integers(0, 4, H)]
        haps = [bh] + [bh.copy() for _ in range(2)]
        for h in haps[1:]:
            h[int(rng.integers(0, H))] = bases[int(rng.integers(0, 4))]
        for r in range(int(rng.integers(5, 40))):
            R = int(rng.integers(40, 130))
            lo = int(rng.integers(0, H - R))
            read = bh[lo:lo + R].copy()
            q = np.full(R, 30, np.uint8)
            o = np.full(R, 45, np.uint8)
            g = np.full(R, 10, np.uint8)
            for h in haps:
                pairs.append((h, read, q, o, o, g))
    grouped = pairhmm_forward_grouped(pairs, interpret=True)
    batch = pack_pairhmm_batch(pairs)
    slabs, nck, B = pack_pallas_inputs(**batch)
    flat = np.asarray(pairhmm_forward_packed(slabs, nck, B, interpret=True))
    np.testing.assert_array_equal(grouped, flat)
