"""Likelihood-engine unit tests: PCR repeat model vectorization cross-check
and read quality preparation."""
import numpy as np

from lorikeet_tpu.calling.likelihoods import (
    _pcr_error_cache, _repeat_length_at, prepare_read_for_hmm,
    repeat_lengths_vector,
)
from lorikeet_tpu.io.bam import BamRecord

BASES = np.frombuffer(b"ACGT", np.uint8)


def test_repeat_lengths_vector_matches_scalar():
    rng = np.random.default_rng(3)
    seqs = [
        np.frombuffer(b"TTCTTCCCC", np.uint8),          # the GATK doc example
        np.frombuffer(b"AAAAAAA", np.uint8),
        np.frombuffer(b"ACGTACGTACGT", np.uint8),
        np.frombuffer(b"AGAGAGAGTTTT", np.uint8),
        np.frombuffer(b"A", np.uint8),
        np.frombuffer(b"AC", np.uint8),
    ]
    for _ in range(12):
        n = int(rng.integers(2, 120))
        # low-entropy sequences maximize repeat structure
        seqs.append(BASES[rng.integers(0, 2, n)])
        seqs.append(BASES[rng.integers(0, 4, n)])
    for seq in seqs:
        vec = repeat_lengths_vector(seq)
        scalar = np.array([_repeat_length_at(seq, i) for i in range(len(seq))])
        assert np.array_equal(vec, scalar), (
            seq.tobytes(), vec.tolist(), scalar.tolist())


def test_pcr_error_cache_values():
    cache = _pcr_error_cache()
    assert cache[0] == 40
    assert cache[100] == 6
    assert all(cache[i] >= cache[i + 1] for i in range(100))


def test_prepare_read_quality_caps():
    n = 40
    seq = BASES[np.random.default_rng(0).integers(0, 4, n)]
    qual = np.full(n, 30, np.uint8)
    qual[5] = 10   # below threshold 18 -> fixed to 6
    rec = BamRecord("r", 0, 0, 0, 25, [("M", n)], seq, qual)
    bases, q, iq, dq, gcp = prepare_read_for_hmm(rec)
    assert q[5] == 6
    assert q[0] == 25          # capped at mapq
    assert (gcp == 10).all()
    # PCR model covers positions 0..n-2 (the reference loop leaves the last
    # base at the default 45)
    assert iq[:-1].max() <= 40 and iq.min() >= 6
    assert iq[-1] == 45


def test_cold_compile_routing_and_prewarm(monkeypatch):
    """A cold pallas bucket routes this batch to the exact host kernel and
    immediately kicks the bucket's background compile; a warm bucket is used
    directly (eager-prewarm dispatch — no cumulative-cells gate)."""
    import lorikeet_tpu.calling.likelihoods as L

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 40)]
    read = hap[5:25].copy()
    q = np.full(20, 30, np.uint8)
    pairs = [(hap, read, q, q, q, np.full(20, 10, np.uint8))] * 3

    monkeypatch.setattr(L, "_PALLAS_WARM_BUCKETS", set())
    monkeypatch.setattr(L, "_prewarm_threads", {})
    prewarmed = []
    monkeypatch.setattr(L, "_prewarm_bucket", prewarmed.append)

    # cold bucket: host path AND the compile thread starts right away
    out_cold = L.compute_pair_likelihoods(pairs, use_pallas=True)
    out_host = L.compute_pair_likelihoods(pairs, use_pallas=False)
    np.testing.assert_allclose(out_cold, out_host)
    for t in list(L._prewarm_threads.values()):
        t.join(5)
    assert prewarmed == [L._pallas_bucket(pairs)]
    # a second cold batch does not restart the landed bucket thread
    prewarmed.clear()
    monkeypatch.setattr(L, "_PALLAS_WARM_BUCKETS",
                        {L._pallas_bucket(pairs)})
    L.compute_pair_likelihoods(pairs, use_pallas=False)
    assert not prewarmed


def test_lane_fit_bucket_geometry():
    """Buckets are 32k-1 so Rpad = roundup(Rmax+1, 128) never spills a
    short read past the 128-lane boundary."""
    from lorikeet_tpu.calling.likelihoods import lane_fit_bucket
    assert lane_fit_bucket(100) == 127          # 100bp read -> Rpad 128
    assert lane_fit_bucket(127) == 127
    assert lane_fit_bucket(128) == 159          # -> Rpad 256
    assert lane_fit_bucket(31) == 31
    assert lane_fit_bucket(1) == 31
    for r in (1, 31, 32, 96, 100, 127, 128, 151, 250):
        b = lane_fit_bucket(r)
        assert b >= r and (b + 1) % 32 == 0


def test_repeat_lengths_native_matches_numpy():
    import numpy as np

    from lorikeet_tpu.calling.likelihoods import (
        MAX_REPEAT_LENGTH,
        MAX_STR_UNIT_LENGTH,
        _repeat_lengths_vector_np,
    )
    from lorikeet_tpu.ops.repeats_native import (
        native_available,
        repeat_lengths_native,
    )

    if not native_available():
        import pytest
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(5)
    B = np.frombuffer(b"ACGT", np.uint8)
    for trial in range(60):
        n = int(rng.integers(0, 160))
        if trial % 2:
            seq = B[rng.integers(0, 2, n)]     # repeat-rich
        else:
            unit = B[rng.integers(0, 4, int(rng.integers(1, 7)))]
            seq = np.tile(unit, 40)[:n]
        got = repeat_lengths_native(seq, MAX_STR_UNIT_LENGTH, MAX_REPEAT_LENGTH)
        assert np.array_equal(got, _repeat_lengths_vector_np(seq))


def test_pcr_indel_model_knob():
    import numpy as np

    from lorikeet_tpu.calling.likelihoods import (
        PCR_INDEL_MODELS,
        prepare_read_for_hmm,
    )
    from lorikeet_tpu.io.bam import BamRecord

    # homopolymer run: repeat caps must bite, harder for lower rate factors
    seq = np.frombuffer(b"ACGT" + b"A" * 12 + b"CGTC", np.uint8)
    rec = BamRecord(name="r", flag=0, tid=0, pos=100, mapq=60,
                    cigar=[("M", len(seq))], seq=seq,
                    qual=np.full(len(seq), 30, np.uint8))
    by_model = {}
    for name, rate in PCR_INDEL_MODELS.items():
        _, _, iq, dq, _ = prepare_read_for_hmm(rec, pcr_rate_factor=rate)
        by_model[name] = (iq.copy(), dq.copy())
    assert np.all(by_model["none"][0] == 45)       # no adjustment at all
    assert by_model["conservative"][0].min() < 45  # repeat cap applied
    # hostile <= aggressive <= conservative, pointwise
    assert np.all(by_model["hostile"][0] <= by_model["aggressive"][0])
    assert np.all(by_model["aggressive"][0] <= by_model["conservative"][0])
    assert np.all(by_model["hostile"][1] <= by_model["conservative"][1])


def test_adaptive_router_cost_model(monkeypatch):
    """The device-vs-host router picks the cheaper side from the measured
    rates, explores the losing side every 16th batch, and honors the
    LORIKEET_PALLAS_ROUTE override."""
    import lorikeet_tpu.calling.likelihoods as L

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 300)]
    read = hap[10:110].copy()
    q = np.full(100, 30, np.uint8)
    pairs = [(hap, read, q, q, q, np.full(100, 10, np.uint8))] * 50

    monkeypatch.setattr(L, "_PERF", {"host_cps": None, "dev_bps": None,
                                     "dev_lat": 0.05, "n_batch": 0})
    monkeypatch.setattr(L, "_ROUTE_MODE", "auto")
    # no data for either side: host first (to learn), then device
    assert L._route_device(pairs) is False
    L._PERF["host_cps"] = 1e9
    assert L._route_device(pairs) is True       # dev side still unknown

    # tunnel-like rates: host 1 Gcells/s, device 27 MB/s -> host wins
    L._PERF["dev_bps"] = 27e6
    assert L._route_device(pairs) is False
    # PCIe-like rates: device 16 GB/s with a slow host -> device wins
    L._PERF["host_cps"] = 5e7
    L._PERF["dev_bps"] = 16e9
    L._PERF["dev_lat"] = 0.001
    assert L._route_device(pairs) is True

    # exploration: the 16th batch flips the decision
    L._PERF["n_batch"] = L._EXPLORE_EVERY - 1
    assert L._route_device(pairs) is False      # flipped from device

    # hard overrides
    monkeypatch.setattr(L, "_ROUTE_MODE", "host")
    assert L._route_device(pairs) is False
    monkeypatch.setattr(L, "_ROUTE_MODE", "device")
    assert L._route_device(pairs) is True
