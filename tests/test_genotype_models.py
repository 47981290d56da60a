"""Genotyping-math conformance tests, ported from the reference suite
(/root/reference/tests/allele_frequency_calculator_unit_tests.rs and
genotype_allele_counts expectations)."""
import numpy as np

from lorikeet_tpu.models.af_calc import AlleleFrequencyCalculator
from lorikeet_tpu.models.genotype_alleles import (
    genotype_count, genotype_count_matrix, genotype_index,
    genotype_likelihoods_from_read_matrix, log10_combination_counts,
)
from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext

A = Allele(b"A", True)
B = Allele(b"C", False)
C = Allele(b"G", False)

DIPLOID, TRIPLOID, TRIALLELIC = 2, 3, 3
FAIRLY_CONFIDENT_PL = 20
EXTREMELY_CONFIDENT_PL = 1000


def test_genotype_enumeration_vcf_order():
    counts = genotype_count_matrix(2, 3)
    # VCF canonical: 0/0, 0/1, 1/1, 0/2, 1/2, 2/2
    expect = [(2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1), (0, 0, 2)]
    assert [tuple(r) for r in counts] == expect
    assert genotype_count(2, 3) == 6
    assert genotype_count(3, 3) == 10
    assert counts.sum(axis=1).tolist() == [2] * 6


def test_log10_combination_counts():
    lc = log10_combination_counts(2, 2)
    # hom: 2!/2! = 1 -> 0 ; het: 2!/1!1! = 2 -> log10 2
    assert np.allclose(lc, [0.0, np.log10(2), 0.0])


def test_genotype_likelihoods_hom_het():
    # One read strongly supporting allele 0
    L = np.array([[0.0, -5.0]])
    gl = genotype_likelihoods_from_read_matrix(L, 2)
    # hom-ref: log10(2*10^0 / 2) = 0; het ~ log10((1+1e-5)/2); hom-alt: -5
    assert abs(gl[0] - 0.0) < 1e-9
    assert abs(gl[2] - (-5.0)) < 1e-9
    assert abs(gl[1] - np.log10((1 + 1e-5) / 2)) < 1e-4


def _pls_for_obvious_call(ploidy, num_alleles, allele_pairs, pl):
    n = genotype_count(ploidy, num_alleles)
    pls = np.full(n, pl, np.float64)
    multiset = []
    for k in range(0, len(allele_pairs), 2):
        multiset += [allele_pairs[k]] * allele_pairs[k + 1]
    pls[genotype_index(ploidy, num_alleles, multiset)] = 0
    return pls


def _genotype(ploidy, num_alleles, allele_pairs, pl, sample):
    pls = _pls_for_obvious_call(ploidy, num_alleles, allele_pairs, pl)
    return Genotype(sample=sample, ploidy=ploidy,
                    log10_likelihoods=pls / -10.0)


def _vc(alleles, genotypes):
    return VariantContext(0, 1, 1, list(alleles), list(genotypes))


def test_mle_counts():
    af = AlleleFrequencyCalculator(1.0, 1.0, 1.0, DIPLOID)
    alleles = [A, B, C]
    AA = _genotype(DIPLOID, TRIALLELIC, [0, 2], FAIRLY_CONFIDENT_PL, 0)
    BB = _genotype(DIPLOID, TRIALLELIC, [1, 2], FAIRLY_CONFIDENT_PL, 1)
    AB = _genotype(DIPLOID, TRIALLELIC, [0, 1, 1, 1], FAIRLY_CONFIDENT_PL, 3)
    AC = _genotype(DIPLOID, TRIALLELIC, [0, 1, 2, 1], FAIRLY_CONFIDENT_PL, 4)
    BBB = _genotype(TRIPLOID, TRIALLELIC, [1, 3], FAIRLY_CONFIDENT_PL, 5)
    CCC = _genotype(TRIPLOID, TRIALLELIC, [2, 3], FAIRLY_CONFIDENT_PL, 6)
    cases = [
        ([AA, BB], [2, 0]),
        ([AA, AB], [1, 0]),
        ([AB, AB], [2, 0]),
        ([AA, AA, BB], [2, 0]),
        ([AA, AB, AB], [2, 0]),
        ([AA, BBB], [3, 0]),
        ([AA, BBB, CCC], [3, 3]),
        ([AA, AB, AC], [1, 1]),
        ([AA, AB, AC, BBB, CCC], [4, 4]),
    ]
    for genotypes, expected in cases:
        result = af.calculate(_vc(alleles, genotypes), DIPLOID)
        assert result.alt_allele_counts.tolist() == expected, (expected,)


def test_many_very_confident_samples():
    af = AlleleFrequencyCalculator(1.0, 1.0, 1.0, DIPLOID)
    alleles = [A, B, C]
    AC = _genotype(DIPLOID, TRIALLELIC, [0, 1, 2, 1], EXTREMELY_CONFIDENT_PL, 0)
    for num_samples in (100, 1000):
        result = af.calculate(_vc(alleles, [AC] * num_samples), DIPLOID)
        assert result.get_allele_count_at_mle(B) == 0
        assert result.get_allele_count_at_mle(C) == num_samples
        expected_log10_p_no_c = num_samples * (np.log10(0.5)
                                               - EXTREMELY_CONFIDENT_PL / 10.0)
        got = result.log10_p_ref_by_allele[C]
        assert abs(got - expected_log10_p_no_c) <= num_samples * 0.01 * abs(expected_log10_p_no_c) + num_samples * 0.01


def test_approximate_multiplicative_confidence():
    af = AlleleFrequencyCalculator(1.0, 1.0, 1.0, DIPLOID)
    alleles = [A, B]
    AA = _genotype(DIPLOID, TRIALLELIC, [0, 2], FAIRLY_CONFIDENT_PL, 0)
    BB = _genotype(DIPLOID, TRIALLELIC, [1, 2], FAIRLY_CONFIDENT_PL, 1)
    # Note: triallelic PLs here, but the VC is biallelic -> take first 3 GLs
    AA = Genotype(0, DIPLOID, AA.log10_likelihoods[:3])
    BB = Genotype(1, DIPLOID, BB.log10_likelihoods[:3])
    gts = []
    log10_p_refs = []
    for _ in range(10):
        gts += [AA, BB]
        r = af.calculate(_vc(alleles, gts), DIPLOID)
        log10_p_refs.append(r.log10_prob_only_ref_allele_exists())
    for n in range(9):
        diff = log10_p_refs[n + 1] - log10_p_refs[n]
        assert abs(diff - log10_p_refs[0]) < 0.01 * abs(log10_p_refs[0]) + 0.05


def test_many_ref_samples_dont_kill_good_variant():
    af = AlleleFrequencyCalculator(1.0, 0.1, 0.1, DIPLOID)
    alleles = [A, B]
    AA = Genotype(0, DIPLOID,
                  _pls_for_obvious_call(DIPLOID, 2, [0, 2], FAIRLY_CONFIDENT_PL) / -10.0)
    AB = Genotype(1, DIPLOID,
                  _pls_for_obvious_call(DIPLOID, 2, [0, 1, 1, 1],
                                        EXTREMELY_CONFIDENT_PL) / -10.0)
    for num_ref in (1, 10, 100, 1000):
        gts = [Genotype(k, DIPLOID, AA.log10_likelihoods) for k in range(num_ref)]
        gts.append(AB)
        r = af.calculate(_vc(alleles, gts), DIPLOID)
        qual = -10 * r.log10_prob_only_ref_allele_exists()
        # a confident het should stay confidently variant regardless of ref panel
        assert qual > 100, (num_ref, qual)


def test_independent_samples_model_heterogeneous_ploidies():
    """Port of independent_samples_genotype_model_unit_tests.rs: per-sample
    GLs from read x allele matrices across heterogeneous ploidies — the GL
    vector has genotype_count(ploidy, alleles) entries, all <= 0 for
    likelihood-like inputs, and allele subsetting keeps that invariant."""
    import numpy as np
    from lorikeet_tpu.models.genotype_alleles import (
        genotype_count, genotype_likelihoods_from_read_matrix)

    rng = np.random.default_rng(3)
    cases = [
        ([1, 1, 1, 1], 1, 0, [10, 100, 50, 20]),
        ([1, 2, 3, 4], 2, 1, [0, 100, 10, 1]),
        ([2, 2, 2, 2], 5, 2, [1, 2, 3, 4]),
        ([2, 1, 2, 1], 10, 4, [10, 20, 50, 40]),
        ([1], 1, 0, [10]),
        ([2], 2, 1, [20]),
    ]
    for ploidies, allele_count, discard, read_counts in cases:
        for keep_all in (True, False) if discard else (True,):
            n_alleles = allele_count if keep_all \
                else max(1, allele_count - discard)
            kept = np.sort(rng.choice(allele_count, n_alleles,
                                      replace=False))
            for ploidy, n_reads in zip(ploidies, read_counts):
                # read likelihood fill mirroring
                # read_likelihoods_unit_tester: best allele near 0, others
                # strongly negative
                L = -np.abs(rng.normal(3.0, 2.0, (n_reads, allele_count)))
                L[np.arange(n_reads),
                  rng.integers(0, allele_count, n_reads)] = \
                    -np.abs(rng.normal(0.01, 0.01, n_reads))
                gls = genotype_likelihoods_from_read_matrix(
                    L[:, kept], ploidy)
                assert gls.shape == (genotype_count(ploidy, n_alleles),)
                if n_reads:
                    assert np.all(gls <= 1e-9), (ploidy, n_alleles)


# ---- further scenarios from allele_frequency_calculator_unit_tests.rs ----

SPAN_DEL = None


def _span_del():
    from lorikeet_tpu.models.variants import SPAN_DEL_ALLELE
    return SPAN_DEL_ALLELE


def test_symmetries():
    """Relabeling B<->C leaves p(only ref) and p(absent) invariant
    (test_symmetries, allele_frequency_calculator_unit_tests.rs:38-140)."""
    af = AlleleFrequencyCalculator(1.0, 0.1, 0.1, DIPLOID)
    alleles = [A, B, C]
    s = iter(range(100))
    AA = _genotype(DIPLOID, TRIALLELIC, [0, 2], FAIRLY_CONFIDENT_PL, next(s))
    BB = _genotype(DIPLOID, TRIALLELIC, [1, 2], FAIRLY_CONFIDENT_PL, next(s))
    CC = _genotype(DIPLOID, TRIALLELIC, [2, 2], FAIRLY_CONFIDENT_PL, next(s))
    AB = _genotype(DIPLOID, TRIALLELIC, [0, 1, 1, 1], FAIRLY_CONFIDENT_PL,
                   next(s))
    AC = _genotype(DIPLOID, TRIALLELIC, [0, 1, 2, 1], FAIRLY_CONFIDENT_PL,
                   next(s))
    BBB = _genotype(TRIPLOID, TRIALLELIC, [1, 3], FAIRLY_CONFIDENT_PL,
                    next(s))
    CCC = _genotype(TRIPLOID, TRIALLELIC, [2, 3], FAIRLY_CONFIDENT_PL,
                    next(s))
    pairs = [
        ([AA, BB], [AA, CC]),
        ([AA, AB], [AA, AC]),
        ([AB, AB], [AC, AC]),
        ([AA, AA, BB], [AA, AA, CC]),
        ([AA, AB, AB], [AA, AC, AC]),
        ([AA, BBB], [AA, CCC]),
    ]
    for g1, g2 in pairs:
        r1 = af.calculate(_vc(alleles, g1), DIPLOID)
        r2 = af.calculate(_vc(alleles, g2), DIPLOID)
        assert abs(r1.log10_prob_only_ref_allele_exists()
                   - r2.log10_prob_only_ref_allele_exists()) < 1e-8
        assert abs(r1.log10_p_ref_by_allele[B]
                   - r2.log10_p_ref_by_allele[C]) < 1e-8


def test_many_samples_with_low_confidence():
    """MLE counts with a heavy ref prior and weak AB evidence
    (test_many_samples_with_low_confidence, :243-276)."""
    af = AlleleFrequencyCalculator(1000.0, 1.0, 1.0, DIPLOID)
    alleles = [A, B]
    AB = _genotype(DIPLOID, 2, [0, 1, 1, 1], FAIRLY_CONFIDENT_PL, 0)
    counts = []
    for n in range(1, 11):
        res = af.calculate(_vc(alleles, [AB] * n), DIPLOID)
        counts.append(res.get_allele_count_at_mle(B))
    assert counts[0] == 0
    assert counts[1] == 0
    assert counts[4] == 2
    assert counts[8] >= 3


def _pl_genotype(ploidy, sample, pls):
    return Genotype(sample=sample, ploidy=ploidy,
                    log10_likelihoods=np.asarray(pls, float) / -10.0)


def test_spanning_deletion_is_not_considered_variant():
    """(test_spanning_deletion_is_not_considered_variant, :396-484)."""
    ploidy = 2
    af = AlleleFrequencyCalculator(1.0, 0.1, 0.1, ploidy)
    alleles = [A, B, _span_del()]
    span_del = _pl_genotype(ploidy, 0, [50, 100, 100, 0, 100, 100])
    low_qual_snp = _pl_genotype(ploidy, 1, [10, 0, 40, 100, 70, 300])

    r = af.calculate(_vc(alleles, [span_del]), ploidy)
    assert r.log10_prob_variant_present() < -10.0

    snp_score = af.calculate(
        _vc(alleles, [low_qual_snp]), ploidy).log10_prob_variant_present()
    both_score = af.calculate(
        _vc(alleles, [low_qual_snp, span_del]),
        ploidy).log10_prob_variant_present()
    assert abs(snp_score - both_score) < 0.1 * max(
        abs(snp_score), abs(both_score), 1.0)
    assert both_score < snp_score

    haploid_ref = _pl_genotype(1, 2, [0, 100, 100])
    hap_score = af.calculate(
        _vc(alleles, [low_qual_snp, haploid_ref]),
        ploidy).log10_prob_variant_present()
    assert abs(hap_score - both_score) < 1e-5

    no_span = af.calculate(
        _vc([A, B], [_pl_genotype(ploidy, 3, [10, 0, 40]),
                     _pl_genotype(1, 4, [0, 100])]),
        ploidy).log10_prob_variant_present()
    assert abs(no_span - both_score) < 1e-6


def test_presence_of_unlikely_spanning_deletion_doesnt_affect_results():
    """(:486-514)."""
    ploidy = 2
    af = AlleleFrequencyCalculator(1.0, 0.1, 0.1, ploidy)
    without = af.calculate(
        _vc([A, B], [_pl_genotype(ploidy, 0, [50, 0, 50])]),
        ploidy).log10_prob_variant_present()
    with_sd = af.calculate(
        _vc([A, B, _span_del()],
            [_pl_genotype(ploidy, 0, [50, 0, 50, 100, 100, 100])]),
        ploidy).log10_prob_variant_present()
    assert abs(with_sd - without) < 1e-4


def test_spanning_deletion_with_very_unlikely_alt_allele():
    """Finite-precision guard (:516-530): must not raise or produce NaN
    (the reference test asserts nothing beyond not crashing; p(variant)
    legitimately underflows to 0, i.e. log10 -> -inf)."""
    ploidy = 4
    af = AlleleFrequencyCalculator(1.0, 0.1, 0.1, ploidy)
    pls = [0] + [10000] * 14
    res = af.calculate(
        _vc([A, _span_del(), B], [_pl_genotype(ploidy, 0, pls)]), ploidy)
    assert not np.isnan(res.log10_prob_variant_present())
    assert not np.isnan(res.log10_prob_only_ref_allele_exists())


def test_single_sample_biallelic_shortcut():
    """(test_single_sample_biallelic_shortcut, :531-576)."""
    def normalize_log10_lin(vals):
        vals = np.asarray(vals, float)
        m = vals.max()
        lin = 10.0 ** (vals - m)
        return lin / lin.sum()

    # haploid-style equal pseudocounts: posterior tracks the likelihoods
    for pseudo in (1.0, 5.0, 10.0):
        af = AlleleFrequencyCalculator(pseudo, pseudo, pseudo, DIPLOID)
        for pl in (10, 100, 1000):
            gl = [0.0, pl / 10.0]
            got = af.calculate_single_sample_biallelic_non_ref_posterior(gl)
            want = normalize_log10_lin(gl)[1]
            assert abs(got - want) < 1e-10

    # diploid: roughly prior x likelihood
    for het in (0.1, 0.01, 0.001):
        af = AlleleFrequencyCalculator(100.0, 100.0 * het, 100.0 * het,
                                       DIPLOID)
        for pl in (10, 100, 1000):
            gl = [0.0, pl / 10.0, -100.0]
            priors = np.log10([(1 - het) ** 2, 2 * het * (1 - het),
                               het ** 2])
            got = af.calculate_single_sample_biallelic_non_ref_posterior(gl)
            want = 1.0 - normalize_log10_lin(np.asarray(gl) + priors)[0]
            assert abs(got - want) < 0.3
