"""Pair-HMM likelihood-engine knobs.

Contracts: assembly_based_caller_utils.rs:926-966 (engine construction from
CLI), pair_hmm_likelihood_calculation_engine.rs:215-320 (dynamic read
disqualification, lookup table at :23-41), allele_likelihoods.rs:378-447
(normalize with/without symmetric reference competition).
"""
import numpy as np
import pytest

from lorikeet_tpu.calling.likelihoods import (
    AlleleLikelihoods, dynamic_read_qual_threshold, prepare_read_for_hmm,
)
from lorikeet_tpu.io.bam import BamRecord


def _rec(seq=b"ACGTACGTAC", qual=30, mapq=60):
    n = len(seq)
    return BamRecord(name="r", flag=0, tid=0, pos=0, mapq=mapq,
                     cigar=[("M", n)],
                     seq=np.frombuffer(seq, np.uint8).copy(),
                     qual=np.full(n, qual, np.uint8))


def test_dynamic_threshold_matches_table_hand_calc():
    # 10 bases at q30: mean 0.039111985, var 1.207526336 each
    quals = np.full(10, 30, np.uint8)
    expect = -(10 * 0.039111985 + 1.0 * np.sqrt(10 * 1.207526336)) / 10.0
    assert dynamic_read_qual_threshold(quals, 1.0) == pytest.approx(expect)


def test_dynamic_threshold_clips_qual_range():
    # q0 and q1 use the first row; q60 uses the q40 row
    lo = dynamic_read_qual_threshold(np.array([0], np.uint8), 0.0)
    assert lo == pytest.approx(-0.5996842844)
    hi = dynamic_read_qual_threshold(np.array([60], np.uint8), 0.0)
    assert hi == pytest.approx(-0.0004911394)


def test_gap_continuation_penalty_flows_into_gcp():
    rec = _rec()
    *_, gcp = prepare_read_for_hmm(rec, gcp_value=25)
    assert (gcp == 25).all()


def test_base_quality_score_threshold_floors_low_quals():
    rec = _rec(qual=17)
    _, q, *_ = prepare_read_for_hmm(rec)                    # default 18
    assert (q == 6).all()
    _, q, *_ = prepare_read_for_hmm(rec, base_quality_score_threshold=10)
    assert (q == 17).all()


def test_cap_to_mapq_toggle():
    rec = _rec(qual=35, mapq=20)
    _, q, *_ = prepare_read_for_hmm(rec)
    assert (q == 20).all()
    _, q, *_ = prepare_read_for_hmm(rec, disable_cap_to_mapq=True)
    assert (q == 35).all()


class _Hap:
    def __init__(self, is_ref):
        self.is_ref = is_ref


def _lks(values):
    haps = [_Hap(True), _Hap(False)]
    reads = {"s0": [_rec(), _rec()]}
    al = AlleleLikelihoods(haps, reads)
    al.values["s0"] = np.array(values, float)
    return al


def test_normalize_symmetric_vs_asymmetric():
    # read 0: ref -1 is best; alt -9.  symmetric floor = -1 - 4.5 = -5.5;
    # asymmetric floor = best alt - 4.5 = -13.5 (no change).
    al = _lks([[-1.0, -2.0], [-9.0, -1.5]])
    al.normalize_likelihoods(-4.5, symmetric=True)
    assert al.values["s0"][1, 0] == pytest.approx(-5.5)
    al = _lks([[-1.0, -2.0], [-9.0, -1.5]])
    al.normalize_likelihoods(-4.5, symmetric=False)
    assert al.values["s0"][1, 0] == pytest.approx(-9.0)
    assert al.values["s0"][0, 0] == pytest.approx(-1.0)


def test_normalize_neg_inf_disables():
    al = _lks([[-1.0, -2.0], [-99.0, -1.5]])
    al.normalize_likelihoods(-np.inf)
    assert al.values["s0"][1, 0] == pytest.approx(-99.0)


def test_static_disqualification_drops_bad_reads():
    al = _lks([[-1.0, -9.0], [-2.0, -9.5]])
    # static threshold for 10bp @ 0.02: min(2, ceil(0.2)) * -4 = -4
    al.filter_poorly_modeled_evidence(dynamic=False)
    assert al.values["s0"].shape[1] == 1
    assert len(al.filtered_reads["s0"]) == 1


def test_dynamic_disqualification_uses_prepared_quals():
    haps = [_Hap(True), _Hap(False)]
    r_good, r_bad = _rec(), _rec()
    for r in (r_good, r_bad):
        prepare_read_for_hmm(r)
    al = AlleleLikelihoods(haps, {"s0": [r_good, r_bad]})
    # dynamic threshold at K=1 for 10bp q30 ~= -1.14; static uncapped = -4
    # => effective threshold min(-1.14, -4) = -4
    al.values["s0"] = np.array([[-3.9, -4.5], [-5.0, -6.0]])
    al.filter_poorly_modeled_evidence(dynamic=True)
    assert al.values["s0"].shape[1] == 1


def test_config_threads_through_engine():
    from lorikeet_tpu.calling.engine import CallerConfig
    cfg = CallerConfig(pair_hmm_gcp=20,
                       disable_dynamic_read_disqualification=True,
                       phred_global_read_mismapping_rate=-1)
    assert cfg.pair_hmm_gcp == 20


def test_cli_accepts_new_flags():
    from lorikeet_tpu.cli import build_parser
    p = build_parser()
    args = p.parse_args([
        "call", "-r", "x.fna", "-b", "y.bam",
        "--pair-hmm-gap-continuation-penalty", "20",
        "--base-quality-score-threshold", "12",
        "--disable-cap-base-qualities-to-map-quality",
        "--phred-scaled-global-read-mismapping-rate", "30",
        "--disable-symmetric-hmm-normalizing",
        "--disable-dynamic-read-disqualification-for-genotyping",
        "--dynamic-read-disqualification-threshold", "2.0",
        "--expected-mismatch-rate-for-read-disqualification", "0.01",
    ])
    assert args.pair_hmm_gap_continuation_penalty == 20
    assert args.disable_dynamic_disq


def test_batch_prep_matches_scalar():
    """prepare_reads_for_hmm_batch must equal prepare_read_for_hmm
    element-for-element (incl. PCR repeat caps and the mapq cap)."""
    import numpy as np
    from lorikeet_tpu.calling.likelihoods import (
        prepare_read_for_hmm, prepare_reads_for_hmm_batch)
    from lorikeet_tpu.testkit.simulate import simulate_reads

    rng = np.random.default_rng(4)
    B4 = np.frombuffer(b"ACGTAAAA", np.uint8)   # homopolymer-rich
    ref = B4[rng.integers(0, 8, 2500)]
    recs = simulate_reads(ref, [], coverage=8, seed=9, tid=0)
    import dataclasses
    recs = [dataclasses.replace(r, mapq=[60, 25, 12][i % 3])
            for i, r in enumerate(recs)]
    for kwargs in (dict(), dict(disable_cap_to_mapq=True),
                   dict(pcr_rate_factor=None), dict(gcp_value=25),
                   dict(base_quality_score_threshold=10)):
        batch = prepare_reads_for_hmm_batch(list(recs), **kwargs)
        for rec, got in zip(recs, batch):
            want = prepare_read_for_hmm(rec, **kwargs)
            for a, b in zip(want, got):
                assert np.array_equal(a, b), kwargs
