"""Pair-HMM conformance tests against the GATK golden dataset.

Golden file: /root/reference/tests/resources/pairhmm-testdata.txt
(hap, read, base/ins/del/gcp quals as ASCII+33, expected log10 likelihood).
Consumption semantics follow the reference harness
(/root/reference/tests/vector_pair_hmm_unit_tests.rs:23-49): qual = char-33,
base quals floored at 6, tolerance 1e-5 for the exact path.
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.ops.pairhmm import (
    pairhmm_forward_np,
    pairhmm_forward_batch,
    pairhmm_forward_checked,
    pack_pairhmm_batch,
)

GOLDEN = "/root/reference/tests/resources/pairhmm-testdata.txt"


def load_golden():
    cases = []
    with open(GOLDEN) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            hap, read, q, iq, dq, gcp, expect = line.split()
            to_q = lambda s, floor: np.maximum(
                floor, np.frombuffer(s.encode(), np.uint8) - 33
            ).astype(np.uint8)
            cases.append(
                (
                    np.frombuffer(hap.encode(), np.uint8),
                    np.frombuffer(read.encode(), np.uint8),
                    to_q(q, 6),
                    to_q(iq, 0),
                    to_q(dq, 0),
                    to_q(gcp, 0),
                    float(expect),
                )
            )
    return cases


pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden data absent")


def test_forward_np_conformance():
    cases = load_golden()
    assert len(cases) > 100
    for hap, read, q, iq, dq, gcp, expect in cases:
        got = pairhmm_forward_np(hap, read, q, iq, dq, gcp)
        assert abs(got - expect) < 1e-5, (expect, got)


def test_forward_batch_conformance():
    cases = load_golden()
    batch = pack_pairhmm_batch([c[:6] for c in cases])
    expect = np.array([c[6] for c in cases])
    got = np.asarray(pairhmm_forward_batch(**batch))
    err = np.abs(got - expect)
    assert err.max() < 2e-3, (err.max(), np.argmax(err))


def test_forward_batch_matches_np_random():
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    # terrible alignment: fully random read (deep low-likelihood regime that
    # once flushed to the f32 floor when the boundary row pinned the scale)
    pairs.append((bases[rng.integers(0, 4, 60)], bases[rng.integers(0, 4, 50)],
                  rng.integers(6, 40, 50).astype(np.uint8),
                  np.full(50, 45, np.uint8), np.full(50, 45, np.uint8),
                  np.full(50, 10, np.uint8)))
    for _ in range(16):
        H = int(rng.integers(20, 160))
        R = int(rng.integers(10, min(H, 100)))
        hap = bases[rng.integers(0, 4, H)]
        # read partially matching a hap window, with errors
        start = int(rng.integers(0, H - R + 1))
        read = hap[start:start + R].copy()
        nerr = int(rng.integers(0, 4))
        for _ in range(nerr):
            read[rng.integers(0, R)] = bases[rng.integers(0, 4)]
        q = rng.integers(6, 40, R).astype(np.uint8)
        iq = rng.integers(30, 50, R).astype(np.uint8)
        dq = rng.integers(30, 50, R).astype(np.uint8)
        gcp = np.full(R, 10, np.uint8)
        pairs.append((hap, read, q, iq, dq, gcp))
    batch = pack_pairhmm_batch(pairs)
    # production contract: device kernel + host f64 escalation of results in
    # the f32 flush zone (deep negatives; see F32_SUSPECT_LOG10)
    got = pairhmm_forward_checked(pairhmm_forward_batch(**batch), pairs)
    for k, p in enumerate(pairs):
        want = pairhmm_forward_np(*p)
        assert abs(got[k] - want) < 2e-3, (k, want, got[k])


def test_native_forward_conformance():
    from lorikeet_tpu.ops.pairhmm_native import (
        native_available,
        pairhmm_forward_native_batch,
    )

    if not native_available():
        pytest.skip("no C++ toolchain")
    cases = load_golden()
    got = pairhmm_forward_native_batch([c[:6] for c in cases])
    expect = np.array([c[6] for c in cases])
    assert np.abs(got - expect).max() < 1e-5


def test_native_forward_matches_np_random():
    from lorikeet_tpu.ops.pairhmm_native import (
        native_available,
        pairhmm_forward_native_batch,
    )

    if not native_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    pairs = []
    for _ in range(24):
        H = int(rng.integers(15, 200))
        R = int(rng.integers(10, 120))
        pairs.append((bases[rng.integers(0, 5, H)], bases[rng.integers(0, 5, R)],
                      rng.integers(6, 45, R).astype(np.uint8),
                      rng.integers(10, 50, R).astype(np.uint8),
                      rng.integers(10, 50, R).astype(np.uint8),
                      np.full(R, 10, np.uint8)))
    got = pairhmm_forward_native_batch(pairs)
    want = np.array([pairhmm_forward_np(*p) for p in pairs])
    # same recurrence in f64: agreement to rounding
    assert np.abs(got - want).max() < 1e-9
