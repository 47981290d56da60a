"""Genotyping-engine knobs.

Contracts: haplotype_caller_genotyping_engine.rs:150-233 (spanning-event
toggle), genotyping_engine.rs:195-250 (assignment method, NDA,
use-posteriors), variant_context_utils.rs:607-690 (split depth gate),
lorikeet_engine.rs:447 (qual-threshold for ANI qualification).
"""
import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig, GenotypingEngine
from lorikeet_tpu.calling.events import create_allele_mapper
from lorikeet_tpu.models.variants import (
    Allele, Genotype, SPAN_DEL_ALLELE, VariantContext,
)


def _biallelic_vc(gls, ads=None, ploidy=2):
    alleles = [Allele(b"A", True), Allele(b"T", False)]
    genotypes = []
    for i, gl in enumerate(gls):
        ad = None if ads is None else np.asarray(ads[i])
        genotypes.append(Genotype(i, ploidy, np.asarray(gl, float),
                                  dp=20, ad=ad))
    return VariantContext(0, 100, 100, alleles, genotypes)


def test_spanning_toggle_maps_to_ref():
    # haplotype 0: event at 100; haplotype 1: deletion spanning 100
    ev_at = VariantContext(0, 100, 100,
                           [Allele(b"A", True), Allele(b"T", False)])
    span = VariantContext(0, 95, 105,
                          [Allele(b"A" * 11, True), Allele(b"A", False)])
    hap_events = [{100: ev_at}, {95: span}]
    merged = VariantContext(0, 100, 100, [Allele(b"A", True),
                                          Allele(b"T", False),
                                          SPAN_DEL_ALLELE])
    m = create_allele_mapper(merged, 100, [None, None], hap_events,
                             emit_spanning_dels=True)
    assert m[SPAN_DEL_ALLELE] == [1]
    merged2 = VariantContext(0, 100, 100, [Allele(b"A", True),
                                           Allele(b"T", False)])
    m = create_allele_mapper(merged2, 100, [None, None], hap_events,
                             emit_spanning_dels=False)
    assert m[merged2.reference] == [1]


def test_unmatched_alt_left_unassigned():
    # haplotype carries a G alt, merged VC (post-subsetting) has only T
    ev = VariantContext(0, 100, 100, [Allele(b"A", True),
                                      Allele(b"G", False)])
    merged = VariantContext(0, 100, 100, [Allele(b"A", True),
                                          Allele(b"T", False)])
    m = create_allele_mapper(merged, 100, [None], [{100: ev}])
    assert all(0 not in v for v in m.values())


def test_set_to_no_call_assignment():
    cfg = CallerConfig(genotype_assignment_method="SetToNoCall")
    eng = GenotypingEngine(cfg)
    vc = _biallelic_vc([[-10.0, -5.0, 0.0]], ads=[[0, 20]])
    call = eng.calculate_genotypes(vc)
    assert call is not None
    assert call.genotypes[0].alleles == []


def test_nda_annotation():
    cfg = CallerConfig(annotate_with_num_discovered_alleles=True)
    eng = GenotypingEngine(cfg)
    call = eng.calculate_genotypes(_biallelic_vc([[-10.0, -5.0, 0.0]],
                                                 ads=[[0, 20]]))
    assert call.attributes["NDA"] == 1
    cfg = CallerConfig()
    call = GenotypingEngine(cfg).calculate_genotypes(
        _biallelic_vc([[-10.0, -5.0, 0.0]], ads=[[0, 20]]))
    assert "NDA" not in call.attributes


def test_qual_threshold_gates_qf():
    from lorikeet_tpu.calling.engine import HaplotypeCallerEngine
    from lorikeet_tpu.calling.likelihoods import AlleleLikelihoods

    def _qf(qual_threshold):
        cfg = CallerConfig(qual_by_depth_filter=0.0,
                           qual_threshold=qual_threshold)
        eng = HaplotypeCallerEngine(cfg)
        call = eng.genotyping.calculate_genotypes(
            _biallelic_vc([[-12.0, -6.0, 0.0]], ads=[[0, 20]]))
        lks = AlleleLikelihoods([], {})
        eng._annotate(call, lks)
        return call.attributes["QF"], call.phred_scaled_qual

    qf_low, qual = _qf(1.0)
    assert qf_low == "true"
    qf_high, _ = _qf(qual + 100)
    assert qf_high == "false"


def test_split_contexts_min_variant_depth():
    from lorikeet_tpu.strain.genotype_mode import split_contexts
    vc = _biallelic_vc([[-20.0, -10.0, 0.0]], ads=[[0, 8]])
    vc.log10_p_error = -50.0
    vc.attributes["QD"] = 30.0
    # qualified-but-shallow alleles drop entirely; nothing goes to filtered
    # (variant_context_utils.rs:629-637)
    assert split_contexts([vc], 25.0, min_variant_depth=10) == ([], [])
    split, filtered = split_contexts([vc], 25.0, min_variant_depth=5)
    assert len(split) == 1 and filtered == []
    # non-qualified sites are returned in filtered, not dropped
    # (lorikeet_engine.rs:626-628 keeps them in the genotype VCF)
    vc.attributes["QD"] = 5.0
    split, filtered = split_contexts([vc], 25.0, min_variant_depth=5)
    assert split == [] and filtered == [vc]


def test_mapping_quality_gate_in_prepare_region():
    from lorikeet_tpu.calling.engine import HaplotypeCallerEngine
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    rng = np.random.default_rng(3)
    ref = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 600)].copy()
    v = Variant(300, ref[300:301].tobytes(),
                b"T" if ref[300] != ord("T") else b"C")
    recs = simulate_reads(ref, [v], coverage=25, seed=3)
    for r in recs:
        r.mapq = 10
    cfg = CallerConfig(mapping_quality_threshold_for_genotyping=20)
    eng = HaplotypeCallerEngine(cfg)
    assert eng.prepare_region(ref, 0, 250, 350, {"s0": recs}) is None
    cfg = CallerConfig(mapping_quality_threshold_for_genotyping=0)
    eng = HaplotypeCallerEngine(cfg)
    assert eng.prepare_region(ref, 0, 250, 350, {"s0": recs}) is not None


def test_phasing_toggle():
    from lorikeet_tpu.calling.engine import HaplotypeCallerEngine
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    rng = np.random.default_rng(7)
    ref = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 800)].copy()
    # SNPs one kmer apart so only the double-variant haplotype assembles
    # (farther-apart variants yield chimeric paths -> unphasable, as in
    #  the reference)
    vs = [Variant(300, ref[300:301].tobytes(),
                  b"T" if ref[300] != ord("T") else b"C"),
          Variant(308, ref[308:309].tobytes(),
                  b"G" if ref[308] != ord("G") else b"A")]
    recs = simulate_reads(ref, vs, coverage=30, seed=7)

    def run(cfg):
        eng = HaplotypeCallerEngine(cfg)
        return eng.call_region(ref, 0, 250, 400, {"s0": recs})

    calls = run(CallerConfig())
    assert len(calls) == 2
    assert any(g.attributes.get("PGT") for c in calls for g in c.genotypes)
    calls = run(CallerConfig(do_not_run_physical_phasing=True))
    assert len(calls) == 2
    assert not any(g.attributes.get("PGT") for c in calls
                   for g in c.genotypes)


def test_cli_accepts_genotyping_flags():
    from lorikeet_tpu.cli import build_parser
    args = build_parser().parse_args([
        "genotype", "-r", "x.fna", "-b", "y.bam",
        "--allele-informative-reads-overlap-margin", "5",
        "--disable-spanning-event-genotyping",
        "--do-not-run-physical-phasing",
        "--genotype-assignment-method", "SetToNoCall",
        "--use-posteriors-to-calculate-qual",
        "--annotate-with-num-discovered-alleles",
        "--qual-threshold", "99",
        "--min-variant-depth-for-genotyping", "4",
        "--mapping-quality-threshold-for-genotyping", "30",
        "--disable-optimizations",
    ])
    assert args.qual_threshold == 99
    assert args.min_variant_depth_for_genotyping == 4
