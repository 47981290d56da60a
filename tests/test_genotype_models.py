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
