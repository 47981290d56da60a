"""Genotype prior calculator + UsePosteriorProbabilities assignment
(genotype_prior_calculator.rs:45-230, variant_context.rs make_genotype_call
UsePosteriorProbabilities arm :524-571, genotyping_engine.rs:216-296
use-posteriors-to-calculate-qual)."""
import math

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig, GenotypingEngine
from lorikeet_tpu.models.genotype_alleles import genotype_count_matrix
from lorikeet_tpu.models.genotype_priors import (
    GenotypePriorCalculator, classify_allele_types, REF, SNP, INDEL, OTHER,
)
from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext

LOG3 = math.log10(3.0)


def test_allele_type_classification():
    ref = Allele(b"AC", True)
    assert classify_allele_types(
        [ref, Allele(b"AT"), Allele(b"A"), Allele(b"ACGT"),
         Allele(b"<NON_REF>")]) == [REF, SNP, INDEL, INDEL, OTHER]
    with pytest.raises(ValueError):
        classify_allele_types([Allele(b"A"), ref])


def test_hw_priors_biallelic_snp():
    gpc = GenotypePriorCalculator.make(0.001, 0.000125)
    alleles = [Allele(b"A", True), Allele(b"T")]
    counts = genotype_count_matrix(2, 2)   # 0/0, 0/1, 1/1
    pri = gpc.log10_priors(counts, alleles)
    assert pri[0] == 0.0
    assert pri[1] == pytest.approx(-3.0 - LOG3)
    assert pri[2] == pytest.approx(-6.0 - LOG3)


def test_hw_priors_indel_and_mixed():
    gpc = GenotypePriorCalculator.make(0.001, 0.000125)
    ih = math.log10(0.000125)
    alleles = [Allele(b"AT", True), Allele(b"A"), Allele(b"AC")]
    counts = genotype_count_matrix(2, 3)  # 0/0,0/1,1/1,0/2,1/2,2/2
    pri = gpc.log10_priors(counts, alleles)
    assert pri[1] == pytest.approx(ih)           # 0/1 het indel
    assert pri[2] == pytest.approx(2 * ih)       # 1/1 hom indel
    assert pri[3] == pytest.approx(-3.0 - LOG3)  # 0/2 het snp
    # 1/2: het indel + het snp
    assert pri[4] == pytest.approx(ih + (-3.0 - LOG3))
    # hom snp = 2*snp_het - log10(3): one normalization, not two
    assert pri[5] == pytest.approx(-6.0 - LOG3)


def test_het_to_hom_ratio():
    gpc = GenotypePriorCalculator.given_het_to_hom_ratio(-3.0, -4.0, -3.0,
                                                         10.0)
    # hom = het - log10(ratio)
    assert gpc.hom_values[SNP] == pytest.approx(gpc.het_values[SNP] - 1.0)
    assert gpc.hom_values[INDEL] == pytest.approx(-4.0 - 1.0)


def test_higher_ploidy_uses_diff_scaling():
    gpc = GenotypePriorCalculator.make(0.001, 0.000125)
    alleles = [Allele(b"A", True), Allele(b"T")]
    counts = genotype_count_matrix(3, 2)  # 0/0/0, 0/0/1, 0/1/1, 1/1/1
    pri = gpc.log10_priors(counts, alleles)
    het = -3.0 - LOG3
    hom = -6.0 - LOG3
    diff = hom - het                              # = -3.0
    assert pri[1] == pytest.approx(het)           # cnt 1
    assert pri[2] == pytest.approx(hom)           # cnt 2 -> hom value
    assert pri[3] == pytest.approx(het + 2 * diff)  # cnt 3 -> het + 2*diff


def _biallelic_vc(gls, ads=None, ploidy=2):
    alleles = [Allele(b"A", True), Allele(b"T", False)]
    genotypes = []
    for i, gl in enumerate(gls):
        ad = None if ads is None else np.asarray(ads[i])
        genotypes.append(Genotype(i, ploidy, np.asarray(gl, float),
                                  dp=20, ad=ad))
    return VariantContext(0, 100, 100, alleles, genotypes)


def test_use_posterior_probabilities_assignment():
    cfg = CallerConfig(
        genotype_assignment_method="UsePosteriorProbabilities")
    eng = GenotypingEngine(cfg)
    call = eng.calculate_genotypes(
        _biallelic_vc([[-12.0, -4.0, 0.0]], ads=[[1, 19]]))
    g = call.genotypes[0]
    # hom-alt stays the max a posteriori call; GP recorded (normalized
    # log10, best entry 0)
    assert [a.bases for a in g.alleles] == [b"T", b"T"]
    gp = g.attributes["GP"]
    assert gp.max() == pytest.approx(0.0)
    assert int(np.argmax(gp)) == 2
    assert 0 <= g.gq <= 99
    # posterior gap = GL gap shrunk by the het-vs-hom prior difference
    # (-4 - 3.477) - (0 - 6.477) = -1.0
    assert gp[1] == pytest.approx(-1.0, abs=1e-6)


def test_priors_flip_borderline_call():
    # GLs slightly favour het; HW priors (~-3.5 per het) flip it to hom-ref
    cfg = CallerConfig(
        genotype_assignment_method="UsePosteriorProbabilities",
        stand_min_conf=0.0)
    eng = GenotypingEngine(cfg)
    vc = _biallelic_vc([[-1.0, 0.0, -8.0]], ads=[[15, 5]])
    call = eng.calculate_genotypes(vc)
    assert call is not None
    g = call.genotypes[0]
    assert [a.bases for a in g.alleles] == [b"A", b"A"]
    # the same GLs under UsePLsToAssign stay het
    eng2 = GenotypingEngine(CallerConfig(stand_min_conf=0.0))
    call2 = eng2.calculate_genotypes(
        _biallelic_vc([[-1.0, 0.0, -8.0]], ads=[[15, 5]]))
    g2 = call2.genotypes[0]
    assert sorted(a.bases for a in g2.alleles) == [b"A", b"T"]


def test_posterior_qual_update_runs():
    cfg = CallerConfig(
        genotype_assignment_method="UsePosteriorProbabilities",
        use_posteriors_to_calculate_qual=True)
    eng = GenotypingEngine(cfg)
    call = eng.calculate_genotypes(
        _biallelic_vc([[-12.0, -3.0, 0.0], [-14.0, -4.0, 0.0]],
                      ads=[[1, 19], [0, 20]]))
    assert call is not None
    assert np.isfinite(call.log10_p_error)
    # QUAL from posteriors: still confidently variant
    assert -10.0 * call.log10_p_error > 20.0
