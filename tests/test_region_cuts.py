"""Active-region cut-site selection, ported from the reference suite
(tests/activity_profile_unit_tests.rs: make_active_region_cut_tests
:611-787 — flat/point/increasing/decreasing profiles cut at
max-region-size, twin Gaussian peaks cut at the valley local minimum;
activity_profile.rs pop_ready_assembly_regions + find_best_cut_site)."""
import math

import numpy as np
import pytest

from lorikeet_tpu.models.activity import extract_regions

ACTIVE_PROB_THRESHOLD = 0.002


def _first_region_size(probs, min_size, max_size):
    arr = np.zeros(len(probs) + max_size + 50)
    arr[:len(probs)] = probs
    regions = extract_regions(arr,
                              active_prob_threshold=ACTIVE_PROB_THRESHOLD,
                              min_region_size=min_size,
                              max_region_size=max_size)
    assert regions and regions[0].is_active
    assert regions[0].start == 0
    return regions[0].end - regions[0].start + 1


def _cases():
    out = []
    for size in (10, 12, 20, 30, 40):
        for min_size in (1, 5, 10):
            max_size = (size * 2) // 3
            if min_size >= max_size:
                continue
            out.append((size, min_size, max_size))
    return out


@pytest.mark.parametrize("size,min_size,max_size", _cases())
def test_flat_profile_cuts_at_max(size, min_size, max_size):
    assert _first_region_size([1.0] * size, min_size, max_size) == max_size


@pytest.mark.parametrize("size,min_size,max_size", _cases())
def test_point_profile(size, min_size, max_size):
    for end in range(1, size):
        got = _first_region_size([1.0] * end, min_size, max_size)
        assert got == min(end, max_size), (end,)


@pytest.mark.parametrize("size,min_size,max_size", _cases())
def test_increasing_profile_cuts_at_max(size, min_size, max_size):
    probs = [(i + 1.0) / size for i in range(size)]
    assert _first_region_size(probs, min_size, max_size) == max_size


@pytest.mark.parametrize("size,min_size,max_size", _cases())
def test_decreasing_profile_cuts_at_max(size, min_size, max_size):
    probs = [1.0 - (i + 1.0) / size for i in range(size)]
    # trailing value hits 0.0 == threshold boundary; region ends there or at
    # max, matching pop_ready semantics (the last position is inactive)
    got = _first_region_size(probs, min_size, max_size)
    assert got == min(max_size, size - 1)


def _gaussian(mean, n, sigma):
    return [math.exp(-0.5 * ((i - mean) / sigma) ** 2)
            / (sigma * math.sqrt(2 * math.pi)) + ACTIVE_PROB_THRESHOLD
            for i in range(n)]


def _reference_cut_site(probs, min_size):
    """The reference test's oracle (:556-571): rightmost interior local
    minimum above min_region_size."""
    for i in range(len(probs) - 2, min_size, -1):
        if probs[i] < probs[i + 1] and probs[i] < probs[i - 1]:
            return i + 1
    return None


@pytest.mark.parametrize("size,min_size,max_size", _cases())
def test_two_peak_profile_cuts_at_valley(size, min_size, max_size):
    for sigma in (1.0, 2.0, 3.0):
        for p1 in range(size // 2):
            for p2 in range(size // 2 + 1, size):
                g1 = _gaussian(p1, size, sigma)
                g2 = _gaussian(p2, size, sigma + 1.0)
                probs = [a + b for a, b in zip(g1, g2)]
                cut = _reference_cut_site(probs, min_size)
                if cut is None or cut >= max_size:
                    continue
                got = _first_region_size(probs, min_size, max_size)
                assert got == max(cut, min_size), (sigma, p1, p2)
