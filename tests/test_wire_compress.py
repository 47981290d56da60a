"""Wire compression for grouped pair-HMM dispatches: the device-side decode
must reproduce the flat operand planes bit-exactly (ops/pairhmm_pallas
_compress_dispatch + _grouped_wire_call), and the full grouped path must
return identical likelihoods with compression on and off."""
import numpy as np
import pytest

import lorikeet_tpu.ops.pairhmm_pallas as P


def _mk_pairs(seed=0, n_regions=3, reads_per=9, haps_per=3,
              with_n=False, qual_variety=3):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    for _ in range(n_regions):
        H = int(rng.integers(40, 90))
        base_hap = bases[rng.integers(0, 4, H)]
        haps = [base_hap]
        for _ in range(haps_per - 1):
            h = base_hap.copy()
            h[int(rng.integers(0, H))] = bases[int(rng.integers(0, 4))]
            haps.append(h)
        for _ in range(reads_per):
            R = int(rng.integers(20, H - 1))
            lo = int(rng.integers(0, H - R))
            read = base_hap[lo:lo + R].copy()
            if with_n:
                read[int(rng.integers(0, R))] = ord("N")
            q = rng.choice([20, 30, 40][:qual_variety], R).astype(np.uint8)
            iq = rng.choice([45, 40][: max(1, qual_variety - 1)],
                            R).astype(np.uint8)
            dq = np.full(R, 45, np.uint8)
            gcp = np.full(R, 10, np.uint8)
            row = (read, q, iq, dq, gcp)
            for h in haps:
                pairs.append((h,) + row)
    return pairs


def _np_decode(payload):
    """Pure-numpy mirror of _grouped_wire_call's decode."""
    qidx, base_nib, hap_nib, cb, sym_tab, lens = payload

    def unnib(p):
        lo = p & 0xF
        hi = p >> 4
        return np.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)

    read_u8 = sym_tab[unnib(base_nib)]
    hap_u8 = sym_tab[unnib(hap_nib)]
    v = cb[qidx.astype(np.int32)]
    return ((v & 0xFF).astype(np.uint8),
            ((v >> 8) & 0xFF).astype(np.uint8),
            ((v >> 16) & 0xFF).astype(np.uint8),
            ((v >> 24) & 0xFF).astype(np.uint8),
            read_u8, hap_u8, lens)


@pytest.mark.parametrize("with_n", [False, True])
def test_wire_roundtrip_bit_exact(with_n, monkeypatch):
    monkeypatch.setattr(P, "_WIRE_COMPRESS", "1")
    pairs = _mk_pairs(seed=1, with_n=with_n)
    dispatches, _, _, _ = P.pack_grouped_inputs(pairs)
    assert dispatches
    for _tables, operands, used in dispatches:
        mode, payload = P._compress_dispatch(operands, used)
        assert mode == "wire"
        decoded = _np_decode(payload)
        for a, b in zip(operands, decoded):
            assert np.array_equal(a, b)


def test_wire_fallback_on_overflow(monkeypatch):
    # >256 distinct qual tuples must fall back to the flat layout
    monkeypatch.setattr(P, "_WIRE_COMPRESS", "1")
    monkeypatch.setattr(P, "_qual_codes",
                        P._SortedCodeCache(256, np.uint32))
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 80)]
    pairs = []
    for i in range(40):
        R = 60
        read = hap[:R].copy()
        q = rng.integers(2, 93, R).astype(np.uint8)     # wild quals
        iq = rng.integers(2, 93, R).astype(np.uint8)
        pairs.append((hap, read, q, iq, np.full(R, 45, np.uint8),
                      np.full(R, 10, np.uint8)))
    dispatches, _, _, _ = P.pack_grouped_inputs(pairs)
    modes = [P._compress_dispatch(ops, u)[0] for _t, ops, u in dispatches]
    assert "flat" in modes


def test_wire_grouped_likelihoods_identical(monkeypatch):
    """Full grouped path (interpret mode, CPU): identical outputs with
    compression forced on vs off."""
    pairs = _mk_pairs(seed=3, n_regions=2, reads_per=5, haps_per=2)
    monkeypatch.setattr(P, "_WIRE_COMPRESS", "0")
    flat = np.asarray(P.pairhmm_forward_grouped(pairs, interpret=True))
    monkeypatch.setattr(P, "_WIRE_COMPRESS", "1")
    wire = np.asarray(P.pairhmm_forward_grouped(pairs, interpret=True))
    assert np.array_equal(flat, wire)


def test_codebook_cache_grows_and_reuses():
    cache = P._SortedCodeCache(256, np.uint32)
    a = np.array([0, 7, 7, 12], np.uint32)
    pos = cache.encode(a)
    assert np.array_equal(cache.keys[pos], a)
    b = np.array([12, 0, 99], np.uint32)
    pos2 = cache.encode(b)
    assert np.array_equal(cache.keys[pos2], b)
    # table() pads to cap
    assert cache.table().shape == (256,)


def test_wire_auto_gate_uses_link_rate(monkeypatch):
    monkeypatch.setattr(P, "_WIRE_COMPRESS", "auto")
    monkeypatch.setattr(P, "_LINK_BPS", [50e6])     # tunnel-class
    assert P._wire_enabled()
    monkeypatch.setattr(P, "_LINK_BPS", [8e9])      # local-PCIe-class
    assert not P._wire_enabled()


def test_pairs_ipc_roundtrip_preserves_identity():
    pairs = _mk_pairs(seed=5)
    payload = P.pack_pairs_ipc(pairs)
    out = P.unpack_pairs_ipc(payload)
    assert len(out) == len(pairs)
    for (h1, r1, q1, i1, d1, g1), (h2, r2, q2, i2, d2, g2) in zip(pairs,
                                                                  out):
        for a, b in ((h1, h2), (r1, r2), (q1, q2), (i1, i2), (d1, d2),
                     (g1, g2)):
            assert np.array_equal(np.asarray(a), b)
    # shared identities survive: pairs of one read against several haps
    # must map to the SAME read view (the grouped dedup keys on id())
    by_read = {}
    for h, r, *_ in out:
        by_read.setdefault(r.tobytes(), set()).add(id(r))
    assert all(len(v) == 1 for v in by_read.values())
