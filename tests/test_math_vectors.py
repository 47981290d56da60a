"""Port of the reference math suite (tests/math_utils_unit_tests.rs):
RunningAverage, approximate/exact log10-sum, normalize, log10_factorial,
fast Bernoulli entropy."""
import numpy as np
import pytest

from lorikeet_tpu.utils.math import (
    RunningAverage, approximate_log10_sum_log10,
    approximate_log10_sum_log10_arr, fast_bernoulli_entropy, log10_factorial,
    log10_sum_log10, normalize_log10,
)

NEG_INF = float("-inf")


def test_running_average():
    """math_utils_unit_tests.rs:18-33."""
    r = RunningAverage()
    for b in [1, 2, 4, 5, 3, 128, 25678, -24]:
        r.add(float(b))
    assert r.obs_count == 8
    assert abs(r.mean - 3224.625) < 2e-10
    assert abs(r.stddev() - 9072.6515881128) < 2e-8


def test_approximate_log_sum_log():
    """math_utils_unit_tests.rs:35-128 (JacobianLogTable accuracy 1e-4)."""
    eps = 1e-4
    v = np.array([0.0, 0.0, 0.0])
    assert abs(approximate_log10_sum_log10_arr(v) - np.log10(3.0)) < eps
    assert approximate_log10_sum_log10_arr(v[0:0]) == NEG_INF
    assert abs(approximate_log10_sum_log10_arr(v[:2]) - np.log10(2.0)) < eps
    assert abs(approximate_log10_sum_log10_arr(v[:1]) - 0.0) < eps
    assert approximate_log10_sum_log10_arr(
        np.array([NEG_INF, NEG_INF, NEG_INF])) == NEG_INF

    rng = np.random.default_rng(0)
    for j in range(5):
        for _ in range(5):
            a, b, c = (1 + 3 * j) * rng.normal(0, 1, 3)
            assert abs(approximate_log10_sum_log10_arr(np.array([a])) - a) \
                < eps
            two = np.log10(10.0 ** a + 10.0 ** b)
            rel = eps * max(1.0, abs(two))
            assert abs(approximate_log10_sum_log10_arr(np.array([a, b]))
                       - two) < rel
            assert abs(approximate_log10_sum_log10(a, b) - two) < rel
            assert abs(approximate_log10_sum_log10(b, a) - two) < rel
            three = np.log10(10.0 ** a + 10.0 ** b + 10.0 ** c)
            assert abs(approximate_log10_sum_log10_arr(np.array([a, b, c]))
                       - three) < eps * max(1.0, abs(three))


def test_approximate_log_sum_log_on_slice():
    """math_utils_unit_tests.rs:130-160: slice [start, end) semantics."""
    eps = 1e-4
    got = approximate_log10_sum_log10_arr(np.array([-32.0, -39.0, -46.0]))
    assert abs(got - -31.9999) < eps * 32
    v = np.array([-35.0, -32.0, -39.0, -46.0, -48.0])
    got = approximate_log10_sum_log10_arr(v[1:4])
    assert abs(got - -31.9999) < eps * 32


def test_log10_sum_log10():
    """math_utils_unit_tests.rs:162-229 partition identities (1e-14)."""
    eps = 1e-14
    log3 = 0.477121254719662
    assert abs(log10_sum_log10(np.array([0.0, 0.0, 0.0])) - log3) < eps
    assert abs(log10_sum_log10(np.array([-5.15])) - -5.15) < eps
    assert abs(log10_sum_log10(np.array([130.0])) - 130.0) < eps * 130
    assert abs(log10_sum_log10(np.array([0.0, 0.0])) - np.log10(2.0)) < eps

    for alpha in [0.999, 0.98, 0.95, 0.90, 0.8, 0.5, 0.3, 0.1, 0.05, 0.001]:
        log_alpha = np.log10(alpha)
        log_1ma = np.log10(1.0 - alpha)
        for n_part in [2, 4, 8, 16, 32, 64, 128, 256, 512, 1028]:
            mult = np.zeros(n_part)
            equal = np.full(n_part, -np.log10(n_part))
            remaining = 0.0
            for i in range(n_part - 1):
                mult[i] = remaining + log_alpha
                remaining += log_1ma
            mult[n_part - 1] = remaining
            assert abs(log10_sum_log10(equal)) < 1e-12
            assert abs(log10_sum_log10(mult)) < 1e-12


def test_normalize():
    """math_utils_unit_tests.rs:231-247."""
    got = normalize_log10(
        np.log10(np.array([3.0, 2.0, 1.0])), True)
    want = np.log10(np.array([3.0, 2.0, 1.0]) / 6.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_log10_factorial():
    """math_utils_unit_tests.rs:249-271."""
    for n, want in [(4.0, 1.3802112), (10.0, 6.559763),
                    (200.0, 374.896888), (12342.0, 45138.2626503)]:
        assert abs(log10_factorial(n) - want) < 1e-6 * max(1.0, want)


def test_fast_bernoulli_entropy():
    """math_utils_unit_tests.rs:292-300 (Pade approximation, 1% rel)."""
    N = 100
    for n in range(N + 1):
        p = n / N
        computed = fast_bernoulli_entropy(p)
        if n in (0, N):
            assert abs(computed) < 1e-8
        else:
            exact = -(p * np.log(p) + (1 - p) * np.log(1 - p))
            assert abs(computed - exact) < 0.01 * max(1.0, exact) + 0.01
