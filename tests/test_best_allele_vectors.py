"""Ported reference vectors: best-allele search with near-tie priority
breaking (tests/allele_likelihoods_unit_tests.rs:250-366 test_best_alleles
against allele_likelihoods.rs:457-553 search_best_allele +
LOG_10_INFORMATIVE_THRESHOLD = 0.2)."""
import numpy as np
import pytest

from lorikeet_tpu.calling.likelihoods import (
    LOG10_INFORMATIVE_THRESHOLD, search_best_alleles,
)


def _reference_expectation(mat, ref_index):
    """The reference test's own oracle (allele_likelihoods_unit_tests.rs:
    286-307 + the ref-override rule :315-345): plain best/second per read,
    then likelihood/allele overridden to REF when the best is non-ref and
    within the informative threshold of ref."""
    A, R = mat.shape
    out = []
    for r in range(R):
        best_lk, second_lk, best_idx = -np.inf, -np.inf, None
        for a in range(A):
            lk = mat[a, r]
            if lk > best_lk:
                second_lk = best_lk
                best_lk = lk
                best_idx = a
            elif lk > second_lk:
                second_lk = lk
        ref_lk = mat[ref_index, r] if ref_index is not None else -np.inf
        override = (ref_index is not None and best_idx != ref_index
                    and best_lk - ref_lk < LOG10_INFORMATIVE_THRESHOLD)
        if override:
            out.append((ref_index, ref_lk, ref_lk - best_lk))
        else:
            out.append((best_idx, best_lk, best_lk - second_lk))
    return out


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("n_alleles", [1, 2, 5])
def test_best_alleles_vs_reference_oracle(seed, n_alleles):
    rng = np.random.default_rng(seed)
    n_reads = 40
    # random likelihoods with many deliberate near-ties
    mat = -rng.random((n_alleles, n_reads)) * 3.0
    tie = rng.random(n_reads) < 0.5
    if n_alleles > 1:
        mat[0, tie] = mat[1:, tie].max(axis=0) - rng.random(
            int(tie.sum())) * 0.19
    priorities = np.zeros(n_alleles, np.int64)
    priorities[0] = 1                       # allele 0 is the reference
    best, lk, conf = search_best_alleles(mat, priorities)
    want = _reference_expectation(mat, 0)
    for r in range(n_reads):
        wb, wlk, wconf = want[r]
        assert best[r] == wb, (r, mat[:, r])
        assert lk[r] == pytest.approx(wlk, abs=1e-12)
        assert conf[r] == pytest.approx(wconf, abs=1e-12)


def test_ref_override_confidence_negative():
    # alt best by 0.1 < threshold: ref takes the read, confidence -0.1
    mat = np.array([[-1.1], [-1.0]])
    best, lk, conf = search_best_alleles(mat, [1, 0])
    assert best[0] == 0
    assert lk[0] == pytest.approx(-1.1)
    assert conf[0] == pytest.approx(-0.1)


def test_clear_winner_unaffected_by_priority():
    mat = np.array([[-2.0], [-1.0]])       # alt wins by 1.0 > 0.2
    best, lk, conf = search_best_alleles(mat, [1, 0])
    assert best[0] == 1
    assert conf[0] == pytest.approx(1.0)


def test_no_priorities_is_plain_argmax():
    mat = np.array([[-1.05], [-1.0]])
    best, lk, conf = search_best_alleles(mat, None)
    assert best[0] == 1
    assert conf[0] == pytest.approx(0.05)


def test_exact_tie_confidence_zero():
    mat = np.array([[-1.0], [-1.0]])
    best, lk, conf = search_best_alleles(mat, [1, 0])
    assert best[0] == 0                    # priority breaks the exact tie
    assert conf[0] == 0.0


def test_realign_priority_prefers_simpler_cigar():
    # three haplotypes within threshold: ref_term + (1 - cigar_elems)
    # priority picks hap 0 (ref, 1 elem, pri 1) over hap 2 (pri 0) and
    # hap 1 (pri -1)
    mat = np.array([[-1.19], [-1.0], [-1.1]])
    pri = np.array([1 + (1 - 1), 0 + (1 - 3), 0 + (1 - 1)])
    best, lk, conf = search_best_alleles(mat, pri)
    assert best[0] == 0
