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
