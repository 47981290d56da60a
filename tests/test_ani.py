"""ANI calculator vectors (conANI / popANI / subpopANI).

Hand-computed expectations against the reference semantics at
/root/reference/src/ani_calculator/ani_calculator.rs:55-405, including the
diagonal self-vs-reference terms (:293-327) and the compared-bases
dual-cursor walk with its simultaneous-exhaustion advance quirk (:141-143).
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext
from lorikeet_tpu.strain.ani import (
    ANICalculator, calculate_compared_bases, consensus_allele_index,
    alleles_present_in_sample, read_ani_table, run_ani,
)


def vc(alleles, ads, qd=30.0, pos=0):
    """A site with one genotype per AD vector."""
    als = [Allele(b if isinstance(b, bytes) else b.encode(), i == 0)
           for i, b in enumerate(alleles)]
    gts = [Genotype(sample=s, ploidy=2, ad=np.asarray(ad, np.int64))
           for s, ad in enumerate(ads)]
    return VariantContext(tid=0, start=pos, end=pos, alleles=als,
                          genotypes=gts, attributes={"QD": qd})


def test_compared_bases_no_rle_is_genome_size():
    cb = calculate_compared_bases(None, 123, 3)
    assert cb.shape == (3, 3) and (cb == 123.0).all()


def test_compared_bases_pairwise_and_diagonal():
    # genome 100: s1 fails 5 bases mid-run, s2 passes everywhere (runs do
    # NOT end together, so the walk counts the overlap correctly)
    cb = calculate_compared_bases([[10, -5, 85], [100]], 100, 2)
    assert cb[0, 1] == cb[1, 0] == 95.0
    # diagonal = genome + sum(negative runs) (ani_calculator.rs:158-162)
    assert cb[0, 0] == 95.0
    assert cb[1, 1] == 100.0


def test_compared_bases_simultaneous_exhaustion_quirk():
    # both first runs end at base 5 -> the reference advances i2 by 2
    # (ani_calculator.rs:141-143), skipping s2's second run; the walk
    # terminates and the -5 run is never counted against the pair
    cb = calculate_compared_bases([[5, -5, 10], [5, 15]], 20, 2)
    assert cb[0, 1] == 20.0          # a correct walk would give 15
    assert cb[0, 0] == 15.0          # diagonal still sees the -5
    assert cb[1, 1] == 20.0


def test_consensus_and_presence_rules():
    site = vc(["A", "T"], [[0, 0], [7, 7], [2, 9]])
    # all-zero depth -> None (variant_context.rs:506-510)
    assert consensus_allele_index(site, 0) is None
    # strict > keeps the FIRST max on ties
    assert consensus_allele_index(site, 1) == 0
    assert consensus_allele_index(site, 2) == 1
    assert alleles_present_in_sample(site, 2, 5).tolist() == [False, True]


def expected_counts():
    """Four sites over two samples; returns (contexts, con, pop, subpop)."""
    contexts = [
        # SNP: s0 hom-alt, s1 hom-ref -> con+1 pair & s0 diag; pop/subpop+1
        vc(["A", "T"], [[0, 10], [10, 0]], pos=10),
        # insertion (len 3): consensus differs -> |3-1|=2; alleles shared
        vc(["A", "ATT"], [[6, 10], [10, 6]], pos=20),
        # below QD filter: ignored
        vc(["A", "T"], [[0, 10], [10, 0]], qd=10.0, pos=30),
        # same consensus, s0 also carries the alt -> subpop only
        vc(["A", "T"], [[10, 10], [10, 0]], pos=40),
    ]
    con = np.array([[3.0, 3.0], [3.0, 0.0]])
    pop = np.array([[1.0, 1.0], [1.0, 0.0]])
    sub = np.array([[1.0, 2.0], [2.0, 0.0]])
    return contexts, con, pop, sub


def test_counting_vectors():
    contexts, con, pop, sub = expected_counts()
    calc = ANICalculator(2)
    calc.consume(contexts)
    np.testing.assert_allclose(calc.conANI, con)
    np.testing.assert_allclose(calc.popANI, pop)
    np.testing.assert_allclose(calc.subpopANI, sub)


def test_sample_with_nothing_present_is_skipped():
    calc = ANICalculator(2)
    calc.consume([vc(["A", "T"], [[0, 2], [20, 0]])])  # s0 below threshold
    assert (calc.conANI == 0).all()
    assert (calc.popANI == 0).all()
    assert (calc.subpopANI == 0).all()


def test_tables_roundtrip(tmp_path):
    contexts, con, pop, sub = expected_counts()
    prefix = os.path.join(tmp_path, "genomeX")
    paths = run_ani(contexts, prefix, ["s1", "s2"], "genomeX", 1000)
    assert set(paths) == {"consensus_ani", "population_ani",
                          "subpopulation_ani"}
    lines = open(paths["consensus_ani"]).read().splitlines()
    # reference header format (ani_calculator.rs:372-391)
    assert lines[0].startswith("##source=lorikeet-v")
    assert lines[1] == "##sample=<ID=1, name=s1>"
    assert lines[2] == "##sample=<ID=2, name=s2>"
    assert lines[3].startswith("SampleID  \t1       \t2")
    assert lines[4].split("\t")[0] == "1"
    for path, counts in ((paths["consensus_ani"], con),
                         (paths["population_ani"], pop),
                         (paths["subpopulation_ani"], sub)):
        names, mat = read_ani_table(path)
        assert names == ["s1", "s2"]
        np.testing.assert_allclose(mat, 1.0 - counts / 1000.0, atol=1e-7)


def test_zero_denominator_matches_f32_division(tmp_path):
    # genome_size 0 -> inf/nan cells, like the reference's f32 divide
    calc = ANICalculator(1)
    calc.consume([vc(["A", "T"], [[0, 10]])])
    calc.finalize(np.zeros((1, 1), np.float32))
    assert np.isneginf(calc.conANI[0, 0])
