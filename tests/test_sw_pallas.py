"""Pallas Smith-Waterman kernel tests (interpret mode on CPU).

The kernel is exact integer DP, so every case must be bit-identical to the
scalar aligner (reference semantics: smith_waterman_aligner.rs:47-442).
Interpret mode is slow, so the suite is a targeted sample: all four overhang
strategies, SNP/insertion/deletion/overhang shapes, multi-bucket batches,
and the >128-diagonal streaming path.
"""
import numpy as np
import pytest

from lorikeet_tpu.ops.smith_waterman import (
    ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS, NEW_SW_PARAMETERS,
    ORIGINAL_DEFAULT, STANDARD_NGS, OverhangStrategy, align,
)
from lorikeet_tpu.ops.sw_pallas import align_batch_pallas

BASES = np.frombuffer(b"ACGT", np.uint8)


def _mutate(rng, seq):
    s = bytearray(seq)
    kind = rng.integers(0, 4)
    pos = int(rng.integers(1, max(2, len(s) - 1)))
    if kind == 0:      # SNP
        s[pos] = BASES[(np.searchsorted(BASES, s[pos]) + 1) % 4]
    elif kind == 1:    # deletion
        dl = int(rng.integers(1, 4))
        del s[pos:pos + dl]
    elif kind == 2:    # insertion
        ins = bytes(BASES[rng.integers(0, 4, int(rng.integers(1, 4)))])
        s[pos:pos] = ins
    else:              # overhang: trim + foreign prefix
        s = bytearray(bytes(BASES[rng.integers(0, 4, 5)])) + s[3:]
    return bytes(s)


def _cases(rng, n, lo=8, hi=60):
    out = []
    for _ in range(n):
        ref = bytes(BASES[rng.integers(0, 4, int(rng.integers(lo, hi)))])
        alt = _mutate(rng, ref)
        if not alt:
            alt = b"A"
        out.append((ref, alt))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("strategy", [
    OverhangStrategy.SOFTCLIP, OverhangStrategy.INDEL,
    OverhangStrategy.LEADING_INDEL, OverhangStrategy.IGNORE,
])
def test_pallas_sw_matches_scalar(strategy):
    rng = np.random.default_rng(strategy + 11)
    pairs = _cases(rng, 24)
    # also: alt == substring (shortcut), alt longer than ref
    pairs.append((b"ACGTACGTAC", b"GTAC"))
    pairs.append((b"ACGTT", b"ACGGTTACG"))
    got = align_batch_pallas(pairs, ORIGINAL_DEFAULT, strategy,
                             interpret=True)
    for k, (ref, alt) in enumerate(pairs):
        want = align(ref, alt, ORIGINAL_DEFAULT, strategy)
        assert got[k] == want, (k, ref, alt, got[k], want)


@pytest.mark.slow
def test_pallas_sw_param_sets_and_long():
    """Haplotype-scale pair (Rpad=256, nchunks>1) under each parameter set."""
    rng = np.random.default_rng(99)
    ref = bytes(BASES[rng.integers(0, 4, 200)])
    alt = _mutate(rng, _mutate(rng, ref))
    short = _cases(rng, 4)
    for params in (NEW_SW_PARAMETERS, STANDARD_NGS,
                   ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS):
        pairs = short + [(ref, alt)]
        got = align_batch_pallas(pairs, params, OverhangStrategy.INDEL,
                                 interpret=True)
        for k, (r, a) in enumerate(pairs):
            want = align(r, a, params, OverhangStrategy.INDEL)
            assert got[k] == want, (k, params, got[k], want)


@pytest.mark.slow
def test_engine_pallas_sw_vcf_identical(tmp_path):
    """Full call pipeline with use_pallas_sw must produce a byte-identical
    VCF to the native-SW path (dispatch equivalence at the engine level)."""
    import os
    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.processing import run_call
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    data = "/root/reference/tests/data/7seqs.fna"
    if not os.path.exists(data):
        pytest.skip("reference data absent")
    fr = FastaReader(data)
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = [
        Variant(300, bytes(ref[300:301]),
                b"C" if ref[300] != ord("C") else b"T"),
        Variant(620, bytes(ref[620:624]), bytes(ref[620:621])),
    ]
    recs = simulate_reads(ref, variants, coverage=30, seed=5,
                          allele_fraction=0.5, error_rate=0.002, tid=tid)
    bam = str(tmp_path / "s.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)), header_text=None)
    vcfs = {}
    for flag in (False, True):
        out = str(tmp_path / f"out_{flag}")
        cfg = CallerConfig(use_pallas=False, use_pallas_sw=flag)
        vcfs[flag] = open(run_call(data, [bam], out, cfg), "rb").read()
    assert vcfs[False] == vcfs[True]
