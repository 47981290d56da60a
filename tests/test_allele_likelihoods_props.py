"""AlleleLikelihoods property tests.

Mirrors /root/reference/tests/allele_likelihoods_unit_tests.rs
(test_marginalization, test_normalize_cap_worst_lk, retain_evidence):
random likelihood matrices, checked against the definitional semantics.
"""
import numpy as np
import pytest

from lorikeet_tpu.calling.likelihoods import AlleleLikelihoods
from lorikeet_tpu.io.bam import BamRecord


def _read(pos, n=10, name="r"):
    return BamRecord(name=name, flag=0, tid=0, pos=pos, mapq=60,
                     cigar=[("M", n)],
                     seq=np.full(n, ord("A"), np.uint8),
                     qual=np.full(n, 30, np.uint8))


def _fill_random(lks, rng):
    for s in lks.values:
        lks.values[s] = -np.abs(rng.normal(3, 2, lks.values[s].shape))


@pytest.mark.parametrize("n_haps,n_alleles,n_reads,seed", [
    (2, 2, 5, 0), (5, 2, 7, 1), (7, 3, 12, 2), (4, 4, 1, 3),
])
def test_marginalization_takes_best_mapped(n_haps, n_alleles, n_reads, seed):
    rng = np.random.default_rng(seed)
    haps = [f"hap{i}" for i in range(n_haps)]
    reads = {0: [_read(100 + i, name=f"r{i}") for i in range(n_reads)],
             1: [_read(200 + i, name=f"q{i}") for i in range(n_reads // 2)]}
    lks = AlleleLikelihoods(haps, reads)
    _fill_random(lks, rng)
    # random surjective mapping allele -> haplotypes
    assignment = rng.integers(0, n_alleles, n_haps)
    assignment[:n_alleles] = np.arange(n_alleles)   # every allele non-empty
    mapper = {f"allele{a}": [h for h in range(n_haps)
                             if assignment[h] == a]
              for a in range(n_alleles)}
    marg = lks.marginalize(mapper)
    assert len(marg.alleles) == n_alleles
    for s, mat in lks.values.items():
        out = marg.values[s]
        assert out.shape == (n_alleles, mat.shape[1])
        for a in range(n_alleles):
            expected = mat[mapper[f"allele{a}"], :].max(axis=0)
            np.testing.assert_array_equal(out[a], expected)


def test_normalize_caps_at_best_plus_cap():
    rng = np.random.default_rng(7)
    haps = ["h0", "h1", "h2"]
    reads = {0: [_read(100 + i, name=f"r{i}") for i in range(9)]}
    lks = AlleleLikelihoods(haps, reads)
    _fill_random(lks, rng)
    before = lks.values[0].copy()
    cap = -0.2
    lks.normalize_likelihoods(cap)
    after = lks.values[0]
    best = before.max(axis=0)
    np.testing.assert_allclose(after, np.maximum(before, best + cap))
    # the best entries themselves are unchanged
    np.testing.assert_allclose(after.max(axis=0), best)


def test_normalize_neg_infinity_cap_is_noop():
    rng = np.random.default_rng(8)
    lks = AlleleLikelihoods(["h0", "h1"], {0: [_read(1), _read(2, name="b")]})
    _fill_random(lks, rng)
    before = lks.values[0].copy()
    lks.normalize_likelihoods(-np.inf)
    np.testing.assert_array_equal(lks.values[0], before)


def test_retain_evidence_keeps_matrix_in_sync():
    rng = np.random.default_rng(9)
    reads = {0: [_read(100 + 10 * i, name=f"r{i}") for i in range(6)]}
    lks = AlleleLikelihoods(["h0", "h1"], reads)
    _fill_random(lks, rng)
    before = lks.values[0].copy()
    keep_names = {"r1", "r3", "r4"}
    lks.retain_evidence(lambda r: r.name in keep_names)
    assert [r.name for r in lks.reads_by_sample[0]] == ["r1", "r3", "r4"]
    np.testing.assert_array_equal(lks.values[0], before[:, [1, 3, 4]])
