"""Ported simple_merge vectors (variant_context_utils_unit_tests.rs:318-1008).

merge_alleles_data: 11 allele-union cases including reference-allele
extension (ATref extends Aref-based alts with the extra 'T').
merge_genotypes_data: 13 genotype priority/PL cases with the reference's
assert_genotypes_are_mostly_equal comparison (gq, has_likelihoods, PLs).
"""
import numpy as np
import pytest

from lorikeet_tpu.models.variant_context_utils import (
    KEEP_IF_ANY_UNFILTERED, PRIORITIZE, simple_merge)
from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext

Aref = Allele(b"A", True)
ATref = Allele(b"AT", True)
A = Allele(b"A", False)
T = Allele(b"T", False)
C = Allele(b"C", False)
G = Allele(b"G", False)
ATC = Allele(b"ATC", False)
ATCATC = Allele(b"ATCATC", False)
ATCATCT = Allele(b"ATCATCT", False)
GT = Allele(b"GT", False)


def makeVC(source, alleles, genotypes=None):
    start = 10
    stop = start + len(alleles[0]) - 1
    vc = VariantContext(0, start, stop, list(alleles),
                        list(genotypes or []))
    vc.source = source
    return vc


def makeG(sample, a1, a2, log10_p_error, pls=None):
    gl = None if pls is None else -np.asarray(pls, np.float64) / 10.0
    return Genotype(sample, 2, gl, [a1, a2],
                    gq=int(round(-10.0 * log10_p_error)))


def _merge(vcs, priority):
    return simple_merge(vcs, priority, len(priority),
                        KEEP_IF_ANY_UNFILTERED, PRIORITIZE, False)


MERGE_ALLELES_CASES = [
    # (inputs..., expected) — last list is the expected allele set
    ([[Aref]], [Aref]),
    ([[Aref], [Aref]], [Aref]),
    ([[Aref], [Aref, T]], [Aref, T]),
    ([[Aref, C], [Aref, T]], [Aref, C, T]),
    ([[Aref, T], [Aref, C]], [Aref, T, C]),
    ([[Aref, C, T]], [Aref, C, T]),
    ([[Aref, T, C]], [Aref, T, C]),
    ([[Aref], [Aref, ATC]], [Aref, ATC]),
    ([[Aref], [Aref, ATC, ATCATC]], [Aref, ATC, ATCATC]),
    ([[Aref, ATCATC], [Aref, ATC, ATCATC]], [Aref, ATCATC, ATC]),
    # ref extension: ATref is the longest ref; Aref-based alts gain 'T'
    ([[ATref, ATC, A, G], [Aref, ATCATC, G]],
     [ATref, ATC, A, G, ATCATCT, GT]),
]


@pytest.mark.parametrize("case", MERGE_ALLELES_CASES)
def test_merge_alleles(case):
    input_lists, expected = case
    vcs = [makeVC(f"vcf{i}", alleles)
           for i, alleles in enumerate(input_lists)]
    priority = [vc.source for vc in vcs]
    merged = _merge(vcs, priority)
    assert merged.n_alleles == len(expected)
    got = {(a.bases, a.is_ref) for a in merged.alleles}
    want = {(a.bases, a.is_ref) for a in expected}
    assert got == want


def assert_genotypes_mostly_equal(actual, expected):
    assert len(actual) == len(expected)
    by_name = {g.sample: g for g in expected}
    for g in actual:
        e = by_name[g.sample]
        assert g.gq == e.gq
        assert g.has_likelihoods() == e.has_likelihoods()
        if g.has_likelihoods():
            np.testing.assert_array_equal(g.pl(), e.pl())


MERGE_GENOTYPES_CASES = [
    ("TakeGenotypeByPriority-1,2", ["1", "2"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0)]),
      makeVC("2", [Aref, T], [makeG(0, Aref, T, -2.0)])],
     makeVC("3", [Aref, T], [makeG(0, Aref, T, -1.0)])),
    ("TakeGenotypeByPriority-2,1", ["2", "1"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0)]),
      makeVC("2", [Aref, T], [makeG(0, Aref, T, -2.0)])],
     makeVC("3", [Aref, T], [makeG(0, Aref, T, -2.0)])),
    ("NonOverlappingGenotypes", ["1", "2"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0)]),
      makeVC("2", [Aref, T], [makeG(1, Aref, T, -2.0)])],
     makeVC("3", [Aref, T], [makeG(0, Aref, T, -1.0),
                             makeG(1, Aref, T, -2.0)])),
    ("PreserveAlleles", ["1", "2"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0)]),
      makeVC("2", [Aref, C], [makeG(1, Aref, C, -2.0)])],
     makeVC("3", [Aref, T, C], [makeG(0, Aref, T, -1.0),
                                makeG(1, Aref, C, -2.0)])),
    ("TakeGenotypePartialOverlap-1,2", ["1", "2"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0)]),
      makeVC("2", [Aref, T], [makeG(0, Aref, T, -2.0),
                              makeG(2, Aref, T, -3.0)])],
     makeVC("3", [Aref, T], [makeG(0, Aref, T, -1.0),
                             makeG(2, Aref, T, -3.0)])),
    ("TakeGenotypePartialOverlap-2,1", ["2", "1"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0)]),
      makeVC("2", [Aref, T], [makeG(0, Aref, T, -2.0),
                              makeG(2, Aref, T, -3.0)])],
     makeVC("3", [Aref, T], [makeG(0, Aref, T, -2.0),
                             makeG(2, Aref, T, -3.0)])),
    ("OrderedPLs", ["1"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0, [1, 2, 3])])],
     makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0, [1, 2, 3])])),
    ("OrderedPLs-3Alleles", ["1"],
     [makeVC("1", [Aref, T, C],
             [makeG(0, Aref, T, -1.0, [1, 2, 3, 4, 5, 6])])],
     makeVC("1", [Aref, T, C],
            [makeG(0, Aref, T, -1.0, [1, 2, 3, 4, 5, 6])])),
    ("OrderedPLs-3Alleles-2", ["1"],
     [makeVC("1", [Aref, C, T],
             [makeG(0, Aref, T, -1.0, [1, 2, 3, 4, 5, 6])])],
     makeVC("1", [Aref, C, T],
            [makeG(0, Aref, T, -1.0, [1, 2, 3, 4, 5, 6])])),
    ("OrderedPLs-3Alleles-3", ["1", "1"],
     [makeVC("1", [Aref, T, C],
             [makeG(0, Aref, T, -1.0, [1, 2, 3, 4, 5, 6])]),
      makeVC("1", [Aref, T, C],
             [makeG(1, Aref, C, -1.0, [1, 2, 3, 4, 5, 6])])],
     makeVC("1", [Aref, T, C],
            [makeG(0, Aref, T, -1.0, [1, 2, 3, 4, 5, 6]),
             makeG(1, Aref, C, -1.0, [1, 2, 3, 4, 5, 6])])),
    ("TakeGenotypePartialOverlapWithPLs-2,1", ["2", "1"],
     [makeVC("1", [Aref, T], [makeG(0, Aref, T, -1.0, [5, 0, 3])]),
      makeVC("2", [Aref, T], [makeG(0, Aref, T, -2.0, [4, 0, 2]),
                              makeG(2, Aref, T, -3.0, [3, 0, 2])])],
     makeVC("3", [Aref, T], [makeG(0, Aref, T, -2.0, [4, 0, 2]),
                             makeG(2, Aref, T, -3.0, [3, 0, 2])])),
    # merged allele set gains T relative to vcf1's [Aref, ATC]: PLs/AD
    # stripped (variant_context_utils.rs:521-536)
    ("TakeGenotypePartialOverlapWithPLs-1,2", ["1", "2"],
     [makeVC("1", [Aref, ATC], [makeG(0, Aref, ATC, -1.0, [5, 0, 3])]),
      makeVC("2", [Aref, T], [makeG(0, Aref, T, -2.0, [4, 0, 2]),
                              makeG(2, Aref, T, -3.0, [3, 0, 2])])],
     makeVC("3", [Aref, ATC, T], [makeG(0, Aref, ATC, -1.0),
                                  makeG(2, Aref, T, -3.0)])),
    # same alleles, different order between inputs: PLs invalid, stripped
    ("MultipleSamplePLsDifferentOrder", ["1", "2"],
     [makeVC("1", [Aref, C, T],
             [makeG(0, Aref, C, -1.0, [1, 2, 3, 4, 5, 6])]),
      makeVC("2", [Aref, T, C],
             [makeG(1, Aref, T, -2.0, [6, 5, 4, 3, 2, 1])])],
     makeVC("3", [Aref, C, T], [makeG(0, Aref, C, -1.0),
                                makeG(1, Aref, T, -2.0)])),
]


@pytest.mark.parametrize(
    "case", MERGE_GENOTYPES_CASES, ids=[c[0] for c in MERGE_GENOTYPES_CASES])
def test_merge_genotypes(case):
    name, priority, inputs, expected = case
    merged = _merge(inputs, priority)
    got = [(a.bases, a.is_ref) for a in merged.alleles]
    want = [(a.bases, a.is_ref) for a in expected.alleles]
    assert got == want, name
    assert_genotypes_mostly_equal(merged.genotypes, expected.genotypes)


def test_merge_requires_same_start():
    v1 = makeVC("1", [Aref, T])
    v2 = makeVC("2", [Aref, C])
    v2.start = 11
    with pytest.raises(ValueError):
        _merge([v1, v2], ["1", "2"])


def test_merge_filtered_are_uncalled_drops_filtered():
    v1 = makeVC("1", [Aref, T])
    v1.filters = ["LowQual"]
    v2 = makeVC("2", [Aref, C])
    merged = simple_merge([v1, v2], ["1", "2"], 2,
                          KEEP_IF_ANY_UNFILTERED, PRIORITIZE, True)
    assert [(a.bases, a.is_ref) for a in merged.alleles] == \
        [(b"A", True), (b"C", False)]
    # all-filtered input -> no merge result at all
    v2.filters = ["LowQual"]
    assert simple_merge([v1, v2], ["1", "2"], 2,
                        KEEP_IF_ANY_UNFILTERED, PRIORITIZE, True) is None


def test_merge_keep_if_any_unfiltered_clears_filters():
    v1 = makeVC("1", [Aref, T])
    v1.filters = ["LowQual"]
    v2 = makeVC("2", [Aref, T])
    merged = _merge([v1, v2], ["1", "2"])
    # one input unfiltered -> merged record keeps no filters
    assert merged.filters == []


def test_merge_dp_adds_up_and_inconsistent_attrs_drop():
    v1 = makeVC("1", [Aref, T])
    v1.attributes = {"DP": 10, "MQ": 60.0, "X": 1}
    v2 = makeVC("2", [Aref, T])
    v2.attributes = {"DP": 5, "MQ": 60.0, "X": 2}
    merged = _merge([v1, v2], ["1", "2"])
    assert merged.attributes["DP"] == 15
    assert merged.attributes["MQ"] == 60.0
    assert "X" not in merged.attributes
