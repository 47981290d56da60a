"""Activity-profile conformance tests.

Kernel goldens from /root/reference/tests/band_pass_activity_profile_unit_tests.rs
:253-282; the pileup->active-prob->regions flow is validated end-to-end on
simulated reads with a known SNP.
"""
import numpy as np

from lorikeet_tpu.models.activity import (
    RefVsAnyProfile, accumulate_read, active_probabilities,
    band_pass_smooth, extract_regions, gaussian_kernel,
)
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

BASES = np.frombuffer(b"ACGT", np.uint8)


def test_kernel_creation_goldens():
    assert np.allclose(gaussian_kernel(1000, 0.01), [1.0], rtol=1e-3)
    k = gaussian_kernel(1000, 1.0)
    expect = [0.0001338302, 0.004431848, 0.053990966, 0.241970723,
              0.398942278, 0.241970723, 0.053990966, 0.004431848, 0.0001338302]
    assert np.allclose(k, expect, rtol=1e-3)
    assert np.allclose(gaussian_kernel(0, 1.0), [1.0], rtol=1e-3)
    assert np.allclose(gaussian_kernel(1, 1.0),
                       [0.2740686, 0.4518628, 0.2740686], rtol=1e-3)
    assert np.allclose(gaussian_kernel(2, 1.0),
                       [0.05448868, 0.24420134, 0.40261995, 0.24420134, 0.05448868],
                       rtol=1e-3)
    # default kernel: adaptive size trims to filter size where p < 1e-5
    kd = gaussian_kernel()
    assert len(kd) % 2 == 1
    assert abs(kd.sum() - 1.0) < 1e-12


def _simulate_profile(variants, L=2000, coverage=30, seed=0, ploidy=2):
    rng = np.random.default_rng(seed)
    ref = BASES[rng.integers(0, 4, L)]
    recs = simulate_reads(ref, variants, coverage=coverage, seed=seed,
                          error_rate=0.001)
    prof = RefVsAnyProfile.zeros(L, ploidy)
    for rec in recs:
        accumulate_read(prof, rec, ref, 0, L, bq=10, ploidy=ploidy)
    return ref, prof


def test_pileup_depth_and_alt_fraction():
    v = Variant(1000, b"A", b"G")
    rng = np.random.default_rng(1)
    ref = BASES[rng.integers(0, 4, 2000)]
    ref[1000] = ord("A")
    recs = simulate_reads(ref, [v], coverage=30, seed=1, error_rate=0.0)
    prof = RefVsAnyProfile.zeros(2000, 2)
    for rec in recs:
        accumulate_read(prof, rec, ref, 0, 2000, bq=10, ploidy=2)
    # at the SNP everything is alt; nearby positions are ref
    assert prof.nonref_depth[1000] > 10
    assert prof.ref_depth[1000] == 0
    assert prof.nonref_depth[900] == 0
    assert prof.ref_depth[900] > 10


def test_active_probabilities_flag_snp():
    ploidy = 2
    rng = np.random.default_rng(2)
    ref = BASES[rng.integers(0, 4, 2000)]
    ref[700] = ord("C")
    v = Variant(700, b"C", b"T")
    recs = simulate_reads(ref, [v], coverage=30, seed=2, error_rate=0.001,
                          allele_fraction=0.5)
    prof = RefVsAnyProfile.zeros(2000, ploidy)
    for rec in recs:
        accumulate_read(prof, rec, ref, 0, 2000, bq=10, ploidy=ploidy)
    gls = prof.finalize_gls(ploidy)[None, :, :]     # one sample
    probs = active_probabilities(gls, ploidy)
    assert probs[700] > 0.99
    # quiet flanks must be inactive
    assert probs[100:600].max() == 0.0
    assert probs[800:1900].max() == 0.0


def test_band_pass_and_region_extraction():
    raw = np.zeros(4000, np.float32)
    raw[2000] = 1.0
    sm = band_pass_smooth(raw)
    assert abs(float(sm.sum()) - 1.0) < 1e-5       # kernel mass preserved
    assert sm[2000] == sm.max()
    regions = extract_regions(sm)
    active = [r for r in regions if r.is_active]
    assert len(active) == 1
    a = active[0]
    assert a.start <= 2000 <= a.end
    # surrounded by inactive regions covering the rest
    spans = [(r.start, r.end) for r in regions]
    assert spans[0][0] == 0
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 == e1 + 1
    assert spans[-1][1] == 3999


def test_region_cut_at_max_size():
    raw = np.full(1000, 0.9, np.float32)
    regions = extract_regions(raw, min_region_size=50, max_region_size=300)
    assert all(r.is_active for r in regions)
    assert all((r.end - r.start + 1) <= 300 for r in regions)
    assert sum(r.end - r.start + 1 for r in regions) == 1000


def test_native_pileup_matches_per_read():
    import numpy as np

    from lorikeet_tpu.io.bam import BamRecord
    from lorikeet_tpu.models.activity import (
        RefVsAnyProfile,
        accumulate_read,
        accumulate_reads,
    )
    from lorikeet_tpu.native.pileup_native import native_available

    if not native_available():
        import pytest
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(9)
    B = np.frombuffer(b"ACGT", np.uint8)
    L = 1200
    ref = B[rng.integers(0, 4, L)]
    recs = []
    for i in range(400):
        rl = int(rng.integers(30, 120))
        p = int(rng.integers(0, L - 30))
        seq = B[rng.integers(0, 4, rl)]
        qual = rng.integers(2, 45, rl).astype(np.uint8)
        style = i % 5
        if style == 0:
            cigar = [("M", rl)]
        elif style == 1:
            s = max(1, rl // 4)
            cigar = [("S", s), ("M", rl - s)]
        elif style == 2:
            a = rl // 3
            cigar = [("M", a), ("I", a), ("M", rl - 2 * a)]
        elif style == 3:
            a = rl // 2
            cigar = [("M", a), ("D", 5), ("M", rl - a)]
        else:
            s = max(1, rl // 5)
            cigar = [("S", s), ("M", rl - 2 * s), ("S", s)]
        recs.append(BamRecord(name=f"r{i}", flag=0, tid=0, pos=p, mapq=60,
                              cigar=cigar, seq=seq, qual=qual))
    for ploidy in (1, 2):
        pa = RefVsAnyProfile.zeros(L, ploidy)
        pb = RefVsAnyProfile.zeros(L, ploidy)
        for r in recs:
            accumulate_read(pa, r, ref, 0, L, bq=10, ploidy=ploidy)
        accumulate_reads(pb, recs, ref, 0, L, bq=10, ploidy=ploidy)
        assert np.array_equal(pa.read_counts, pb.read_counts)
        assert np.array_equal(pa.ref_depth, pb.ref_depth)
        assert np.array_equal(pa.nonref_depth, pb.nonref_depth)
        assert np.array_equal(pa.hq_sc_n, pb.hq_sc_n)
        assert np.allclose(pa.hq_sc_sum, pb.hq_sc_sum)
        assert np.abs(pa.gl - pb.gl).max() < 1e-9
