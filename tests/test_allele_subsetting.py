"""Allele subsetting (allele_subsetting_utils.rs:30-310)."""
import numpy as np

from lorikeet_tpu.models.allele_subsetting import (
    calculate_likelihood_sums, subset_vc_alleles,
)
from lorikeet_tpu.models.genotype_alleles import genotype_count_matrix
from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext


def _vc_three_alts():
    alleles = [Allele(b"A", True), Allele(b"C", False),
               Allele(b"G", False), Allele(b"T", False)]
    # diploid, 4 alleles -> 10 genotypes in canonical order
    g = Genotype(0, 2)
    gls = np.full(10, -30.0)
    gls[0] = -10.0                     # hom ref baseline
    counts = genotype_count_matrix(2, 4)
    # favor the A/G het strongly, A/C a bit
    ag = next(i for i, row in enumerate(counts)
              if row[0] == 1 and row[2] == 1)
    ac = next(i for i, row in enumerate(counts)
              if row[0] == 1 and row[1] == 1)
    gls[ag] = 0.0
    gls[ac] = -6.0
    g.log10_likelihoods = gls
    g.ad = np.array([10, 2, 12, 0])
    vc = VariantContext(0, 100, 100, alleles, [g])
    return vc


def test_likelihood_sums_rank_alleles():
    vc = _vc_three_alts()
    sums = calculate_likelihood_sums(vc.genotypes, 2, 4)
    assert sums[2] > sums[1] >= sums[3]      # G best, C next, T unsupported


def test_subset_keeps_best_alts_and_remaps():
    vc = _vc_three_alts()
    subset_vc_alleles(vc, 2, 1)
    assert [str(a) for a in vc.alleles] == ["A", "G"]
    g = vc.genotypes[0]
    assert len(g.log10_likelihoods) == 3     # diploid biallelic
    # best genotype remains the het with the kept alt
    assert int(np.argmax(g.log10_likelihoods)) == 1
    assert g.ad.tolist() == [10, 12]


def test_subset_noop_within_cap():
    vc = _vc_three_alts()
    before = list(vc.alleles)
    subset_vc_alleles(vc, 2, 6)
    assert vc.alleles == before
