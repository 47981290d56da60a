"""Reference-parity quirks of the genotyping engine output path.

Contracts:
- variant_context.rs:326-328 — UsePLsToAssign forces a no-call when the
  subset GLs are non-informative (sum >= SUM_GL_THRESH_NOCALL = -0.1);
- variant_context.rs:366-378 — BestMatchToOriginal preserves no-call
  alleles rather than rewriting them to reference;
- genotyping_engine.rs:252-296 — posterior-based QUAL clamps the
  normalizer in PHRED space (identity for max-normalized posteriors);
- genotyping_engine.rs:337-455 — '*' alleles are never emitted, sites
  covered by an emitted upstream deletion are suppressed
  (record_deletions + is_vc_covered_by_deletion), and forced
  (features-VCF) alleles bypass the emit threshold with LowQual;
- variant_annotation.rs:101-122,360-405 — DP (format + site) is the sum
  of informative AD, and QD's denominator follows get_depth;
- haplotype_caller_genotyping_engine.rs:737-752 — ANY event starting
  upstream of loc becomes a '*' placeholder (no ref/alt length test).
"""
import numpy as np

from lorikeet_tpu.calling.engine import (
    CallerConfig, GenotypingEngine, HaplotypeCallerEngine,
)
from lorikeet_tpu.calling.events import events_at_locus
from lorikeet_tpu.models.variants import (
    Allele, Genotype, NO_CALL, SPAN_DEL_ALLELE, VariantContext,
)


def _vc(gls, ads=None, alleles=None, ploidy=2, start=100):
    alleles = alleles or [Allele(b"A", True), Allele(b"T", False)]
    genotypes = []
    for i, gl in enumerate(gls):
        ad = None if ads is None else np.asarray(ads[i])
        genotypes.append(Genotype(i, ploidy, np.asarray(gl, float),
                                  dp=20, ad=ad))
    end = start + len(alleles[0]) - 1
    return VariantContext(0, start, end, alleles, genotypes)


def test_uninformative_gls_force_no_call():
    # sample 0 informative hom-alt, sample 1 flat (e.g. zero retained reads)
    vc = _vc([[-20.0, -6.0, 0.0], [0.0, 0.0, 0.0]],
             ads=[[0, 10], [0, 0]])
    call = GenotypingEngine(CallerConfig()).calculate_genotypes(vc)
    assert call is not None
    called, nocall = call.genotypes
    assert len(called.alleles) == 2
    assert nocall.alleles == [] and nocall.gq == -1
    # the no-call is excluded from AN
    eng = HaplotypeCallerEngine(CallerConfig())

    class _Lks:
        samples = []
        reads_by_sample = {}
        alleles = call.alleles
        values = {}
    eng._annotate(call, _Lks())
    assert call.attributes["AN"] == 2


def test_best_match_to_original_keeps_no_call():
    cfg = CallerConfig(genotype_assignment_method="BestMatchToOriginal")
    vc = _vc([[-20.0, 0.0, -6.0]])
    vc.genotypes[0].alleles = [NO_CALL, Allele(b"T", False)]
    call = GenotypingEngine(cfg).calculate_genotypes(vc)
    g = call.genotypes[0]
    assert g.alleles[0] is NO_CALL          # preserved, not ref-rewritten
    assert g.alleles[1] == Allele(b"T", False)


def test_posterior_qual_reducer_is_identity_for_normalized():
    # GP max-normalized: reference reducer = max(0, phred_sum) = 0, so the
    # per-sample contribution is exactly gp[0]
    g = Genotype(0, 2, np.array([0.0, -0.05, -3.0]))
    g.attributes["GP"] = np.array([0.0, -0.05, -3.0])
    total = GenotypingEngine._phred_no_variant_posterior([g])
    assert abs(total - 0.0) < 1e-12


def test_span_del_allele_never_emitted():
    alleles = [Allele(b"A", True), Allele(b"T", False), SPAN_DEL_ALLELE]
    vc = _vc([[-20.0, -6.0, 0.0, -18.0, -5.0, -19.0]], alleles=alleles,
             ads=[[0, 10, 3]])
    call = GenotypingEngine(CallerConfig()).calculate_genotypes(vc)
    assert call is not None
    assert SPAN_DEL_ALLELE not in call.alleles


def test_site_covered_by_emitted_deletion_suppressed():
    eng = GenotypingEngine(CallerConfig())
    # emit a 10bp deletion at 100 (covers 101..110)
    del_vc = _vc([[-20.0, -6.0, 0.0]], ads=[[0, 10]],
                 alleles=[Allele(b"A" * 11, True), Allele(b"A", False)],
                 start=100)
    assert eng.calculate_genotypes(del_vc) is not None
    # a confident SNP inside the deleted span is suppressed
    snp = _vc([[-20.0, -6.0, 0.0]], ads=[[0, 10]], start=105)
    assert eng.calculate_genotypes(snp) is None
    # the same SNP at the deletion start (same-start rule) is NOT suppressed
    snp_at = _vc([[-20.0, -6.0, 0.0]], ads=[[0, 10]], start=100)
    assert eng.calculate_genotypes(snp_at) is not None
    # and once past the deletion end the record is culled
    snp_past = _vc([[-20.0, -6.0, 0.0]], ads=[[0, 10]], start=111)
    assert eng.calculate_genotypes(snp_past) is not None


def test_forced_alleles_bypass_emit_threshold():
    # low-evidence site: one ref-leaning sample, nowhere near the threshold
    vc = _vc([[0.0, -0.4, -3.0]], ads=[[9, 1]])
    eng = GenotypingEngine(CallerConfig())
    assert eng.calculate_genotypes(vc) is None
    given = VariantContext(0, 100, 100,
                           [Allele(b"A", True), Allele(b"T", False)])
    call = eng.calculate_genotypes(vc, given_alleles=[given])
    assert call is not None
    assert Allele(b"T", False) in call.alleles
    assert "LowQual" in call.filters


def test_dp_and_qd_use_ad_sums():
    vc = _vc([[-20.0, -6.0, 0.0], [-15.0, -4.0, 0.0]],
             ads=[[2, 10], [3, 7]])
    call = GenotypingEngine(CallerConfig()).calculate_genotypes(vc)
    eng = HaplotypeCallerEngine(CallerConfig())

    class _Lks:
        samples = []
        reads_by_sample = {}
        alleles = call.alleles
        values = {}
    eng._annotate(call, _Lks())
    # format DP overwritten with total AD; site DP is their sum (not the
    # retained-read count of 20 per sample)
    assert [g.dp for g in call.genotypes] == [12, 10]
    assert call.attributes["DP"] == 22
    # QD denominator = AD-restricted depth (both samples alt-supporting)
    assert abs(call.attributes["QD"]
               - round(call.phred_scaled_qual / 22, 2)) < 1e-9


def test_spanning_placeholder_has_no_length_test():
    # block substitution: ref len 3, alt len 4 (alt NOT shorter) spanning
    # loc 102 still yields a '*' placeholder
    block = VariantContext(0, 100, 102,
                           [Allele(b"ACG", True), Allele(b"TTTT", False)])
    out = events_at_locus(102, [{100: block}], include_spanning=True)
    assert out == ["SPAN_DEL"]
