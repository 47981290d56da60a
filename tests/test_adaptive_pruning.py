"""Log-likelihood-ratio math + adaptive chain pruning
(haplotype_caller_engine.rs:1761-1813, adaptive_chain_pruner.rs)."""
import math

import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph, assemble_region
from lorikeet_tpu.utils.math import (
    digamma, log_likelihood_ratio_constant_error,
)


def _ln_beta(a, b):
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


@pytest.mark.parametrize("n_ref,n_alt,err", [
    (100, 5, 1e-4), (100, 20, 1e-4), (100, 200, 1e-4),
    (10, 2, 1e-4), (1000, 2, 1e-5), (10000, 2, 1e-6),
])
def test_llr_leading_order(n_ref, n_alt, err):
    """Golden test ported from
    reference tests/haplotype_caller_engine_unit_tests.rs:14-38."""
    calculated = log_likelihood_ratio_constant_error(n_ref, n_alt, err)
    expected = _ln_beta(n_ref + 1, n_alt + 1) - n_alt * math.log(err)
    # approx::relative_eq!(..., epsilon = 0.07): abs OR relative tolerance
    assert calculated == pytest.approx(expected, rel=0.07, abs=0.07)


def test_digamma_values():
    # psi(1) = -gamma, psi(2) = 1 - gamma
    gamma = 0.5772156649015329
    assert digamma(1.0) == pytest.approx(-gamma, abs=1e-8)
    assert digamma(2.0) == pytest.approx(1 - gamma, abs=1e-8)


class _FakeRead:
    _n = 0

    def __init__(self, seq, qual=30):
        self.seq = np.frombuffer(seq, np.uint8)
        self.qual = np.full(len(seq), qual, np.uint8)
        self.cigar = [("M", len(seq))]
        self.pos = 0
        _FakeRead._n += 1
        self.name = f"fr{_FakeRead._n}"


def _assemble(ref, reads, **kw):
    return assemble_region(np.frombuffer(ref, np.uint8), {0: reads},
                           kmer_sizes=(11,), **kw)


def test_adaptive_pruning_removes_singleton_error():
    rng = np.random.default_rng(0)
    ref = bytes(rng.choice(list(b"ACGT"), 120).astype(np.uint8))
    alt = bytearray(ref)
    alt[60] = ord("T") if alt[60] != ord("T") else ord("A")
    alt = bytes(alt)
    err = bytearray(ref)
    err[30] = ord("G") if err[30] != ord("G") else ord("C")
    err = bytes(err)
    # ~30x coverage: a singleton path is decisively below the log-odds
    # threshold (at ~12x the two-pass error-rate estimate makes a single
    # error read borderline, as in the reference's math)
    reads = ([_FakeRead(ref[i:i + 60]) for i in range(0, 61, 2)]
             + [_FakeRead(alt[i:i + 60]) for i in range(0, 61, 2)]
             + [_FakeRead(err[10:70])])          # single error read
    haps = _assemble(ref, reads, use_adaptive_pruning=True)
    seqs = {h.bases for h in haps}
    assert alt in seqs                            # real variant survives
    assert err not in seqs                        # singleton error pruned
    # without pruning, the error path survives
    haps_np = _assemble(ref, reads, use_adaptive_pruning=False,
                        prune_factor=0, disable_prune_correction=True)
    assert err in {h.bases for h in haps_np}


def test_adaptive_pruning_keeps_balanced_het():
    rng = np.random.default_rng(1)
    ref = bytes(rng.choice(list(b"ACGT"), 120).astype(np.uint8))
    alt = bytearray(ref)
    alt[55] = ord("C") if alt[55] != ord("C") else ord("G")
    alt = bytes(alt)
    reads = ([_FakeRead(ref[i:i + 60]) for i in range(0, 61, 4)]
             + [_FakeRead(alt[i:i + 60]) for i in range(0, 61, 4)])
    haps = _assemble(ref, reads, use_adaptive_pruning=True)
    assert alt in {h.bases for h in haps}
