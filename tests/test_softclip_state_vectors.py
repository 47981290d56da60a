"""HQ-soft-clip activity-state expansion: ported reference vectors.

The reference propagates high-quality soft-clip evidence by EXPANDING the
position's state into 2n+1 discrete states, each carrying the full active
prob, summed into neighbours (activity_profile_state.rs:17-27,
activity_profile.rs:308-339 process_state + incorporate_single_state;
tests/activity_profile_unit_tests.rs:451-533 test_soft_clips).  These
tests pin lorikeet_tpu's vectorized expansion (expand_hq_softclip_states)
to a direct scalar port of the reference algorithm, re-run the reference's
test_soft_clips assertions, and check the device (JAX) form agrees."""
import numpy as np
import pytest

from lorikeet_tpu.models.activity import (
    AVERAGE_HQ_SOFTCLIPS_HQ_BASES_THRESHOLD as HQ_T,
    band_pass_smooth, expand_hq_softclip_states, extract_regions,
)


def _expand_reference_scalar(probs, hq_mean, prop=50):
    """Direct scalar port of the reference loop: per position, an HQ state
    (mean >= 6.0, the engine's ActivityProfileDataType::new threshold)
    emits its full prob at every offset -n..n (n = min(mean as i64,
    prop)); out-of-profile offsets are dropped
    (incorporate_single_state position>=0 gate / get_loc_for_offset)."""
    L = len(probs)
    out = np.zeros(L)
    for i in range(L):
        if hq_mean[i] >= HQ_T and probs[i] > 0.0:
            n = int(min(hq_mean[i], prop))
            for j in range(i - n, i + n + 1):
                if 0 <= j < L:
                    out[j] += probs[i]
        else:
            out[i] += probs[i]
    return out


@pytest.mark.parametrize("start", [0, 5, 60, 140, 190, 199])
@pytest.mark.parametrize("soft_clip_size", [6, 10, 100])
def test_soft_clips_reference_family(start, soft_clip_size):
    """Port of tests/activity_profile_unit_tests.rs:451-507: one HQ
    soft-clip state with prob 1.0 at `start`; positions within
    min(size, propagation) must be > 0, all others exactly 0.  (The
    reference test also runs sizes 1 and 2 by constructing the state
    directly; through the engine's >=6 threshold those sizes never
    produce an HQ state, so the in-pipeline family starts at 6.)"""
    L, prop = 200, 50
    probs = np.zeros(L)
    probs[start] = 1.0
    hq = np.zeros(L)
    hq[start] = soft_clip_size
    out = expand_hq_softclip_states(probs, hq, prop)
    n = min(soft_clip_size, prop)
    dist = np.abs(np.arange(L) - start)
    assert np.all(out[dist <= n] > 0.0), \
        "active prob should be changed within soft clip size"
    assert np.all(out[dist > n] == 0.0), \
        "active prob must be untouched outside soft clip size"
    # full-prob discrete states, not a smeared kernel
    assert np.allclose(out[dist <= n], 1.0)


def test_threshold_is_inclusive_at_six():
    # ActivityProfileDataType::new: mean >= threshold (engine passes 6.0)
    L = 101
    probs = np.zeros(L)
    probs[50] = 0.5
    hq = np.zeros(L)
    hq[50] = 6.0
    out = expand_hq_softclip_states(probs, hq.copy())
    assert np.count_nonzero(out) == 13           # +/- 6
    hq[50] = 5.999
    out = expand_hq_softclip_states(probs, hq)
    assert np.count_nonzero(out) == 1            # no expansion


def test_overlapping_expansions_sum():
    probs = np.zeros(60)
    probs[20] = 0.3
    probs[26] = 0.4
    hq = np.zeros(60)
    hq[20] = hq[26] = 8.0
    out = expand_hq_softclip_states(probs, hq)
    # positions covered by both windows carry both probs summed
    both = out[(np.arange(60) >= 18) & (np.arange(60) <= 28)]
    assert np.allclose(both, 0.7)


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_matches_scalar_reference_port(seed):
    rng = np.random.default_rng(seed)
    L = 400
    probs = np.where(rng.random(L) < 0.1, rng.random(L), 0.0)
    hq = np.where(rng.random(L) < 0.08,
                  rng.uniform(0, 80, L), 0.0)
    fast = expand_hq_softclip_states(probs.copy(), hq)
    slow = _expand_reference_scalar(probs, hq)
    assert np.allclose(fast, slow, atol=1e-12)


def test_device_expansion_matches_host():
    import jax
    from lorikeet_tpu.parallel.pipeline import _expand_hq_jax
    rng = np.random.default_rng(3)
    L = 300
    probs = np.where(rng.random(L) < 0.15,
                     rng.random(L), 0.0).astype(np.float32)
    hq = np.where(rng.random(L) < 0.1,
                  rng.uniform(0, 70, L), 0.0).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        dev = np.asarray(_expand_hq_jax(probs, hq, 50))
    host = expand_hq_softclip_states(probs.astype(np.float64), hq)
    assert np.allclose(dev, host, atol=1e-5)


def test_region_boundaries_extend_with_softclip_wall():
    """Soft-clip wall at a region edge: the discrete expansion must pull
    the active-region boundary outward (soft-clipped bases are absent
    from pileups; the expansion is how the reference recovers the signal
    — activity_profile.rs:312 comment)."""
    L = 600
    probs = np.zeros(L, np.float32)
    probs[300:311] = 0.9
    base = band_pass_smooth(probs, np.zeros(L))
    walled = probs.copy()
    hq = np.zeros(L)
    hq[300] = 40.0                       # HQ soft-clip wall at left edge
    ext = band_pass_smooth(walled, hq)
    r_base = [r for r in extract_regions(base) if r.is_active]
    r_ext = [r for r in extract_regions(ext) if r.is_active]
    assert r_base and r_ext
    assert min(r.start for r in r_ext) < min(r.start for r in r_base), \
        "soft-clip wall must extend the active region leftward"


def test_mixed_hq_lq_clips_only_hq_expand():
    L = 400
    probs = np.zeros(L, np.float32)
    probs[100] = probs[250] = 0.8
    hq = np.zeros(L)
    hq[100] = 30.0                       # HQ: expands
    hq[250] = 3.0                        # LQ mean below threshold: no-op
    out = expand_hq_softclip_states(probs.astype(np.float64), hq)
    assert np.count_nonzero(out[70:131]) == 61
    assert np.count_nonzero(out[220:281]) == 1
