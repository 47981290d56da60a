"""AlleleList/Permutation mechanics, ported from the reference suite
(tests/allele_list_unit_tests.rs: test_empty_list, single_allele_list_data
-> test_self_permutation/test_subset_permutation, plus the shuffled
permutation scenario from the Rust source comments and Permutation::new
semantics at src/model/allele_list.rs:149-200)."""
import numpy as np
import pytest

from lorikeet_tpu.models.allele_list import AlleleList, AllelePermutation
from lorikeet_tpu.models.variants import Allele

ALLELE_COUNT = [0, 1, 5, 10, 20]
MAX_ALLELE_LENGTH = [1, 2, 3, 10]
BASES = b"ACGT"


def random_alleles(rng, count, max_len):
    """Random alleles, first one (if any) the reference; duplicates are
    allowed and dedup'd by AlleleList, as with the reference's IndexSet
    (test_utils/allele_list_unit_tester.rs role)."""
    out = []
    for k in range(count):
        n = int(rng.integers(1, max_len + 1))
        seq = bytes(BASES[rng.integers(0, 4)] for _ in range(n))
        out.append(Allele(seq, is_ref=k == 0))
    return out


def test_empty_list():
    al = AlleleList()
    assert al.number_of_alleles() == 0
    assert al.index_of_reference() is None


def all_lists():
    rng = np.random.default_rng(31)
    return [random_alleles(rng, c, m)
            for c in ALLELE_COUNT for m in MAX_ALLELE_LENGTH]


@pytest.mark.parametrize("alleles", all_lists(),
                         ids=lambda a: f"n{len(a)}")
def test_self_permutation(alleles):
    original = AlleleList(alleles)
    perm = original.permutation(AlleleList(alleles))
    assert perm.from_size() == original.number_of_alleles()
    assert perm.to_size() == original.number_of_alleles()
    assert perm.is_non_permuted()
    assert not perm.is_partial()
    for i in range(original.number_of_alleles()):
        assert perm.get_allele(i) == original.get_allele(i)
        assert perm.from_index(i) == i
        assert perm.to_index(i) == i
        assert perm.is_kept(i)
    assert perm.from_list() == perm.to_list()


@pytest.mark.parametrize("alleles", all_lists(),
                         ids=lambda a: f"n{len(a)}")
def test_subset_permutation(alleles):
    rng = np.random.default_rng(57)
    subset = [a for a in alleles if rng.random() < 0.5]
    original = AlleleList(alleles)
    target = AlleleList(subset)
    perm = original.permutation(target)
    if original.number_of_alleles() == target.number_of_alleles():
        return  # not a strict subset; covered by self-permutation
    assert perm.is_partial()
    assert not perm.is_non_permuted()
    assert perm.from_size() == original.number_of_alleles()
    assert perm.to_size() == target.number_of_alleles()
    for i in range(target.number_of_alleles()):
        assert perm.from_index(i) == \
            original.index_of_allele(target.get_allele(i))
    for j in range(original.number_of_alleles()):
        a = original.get_allele(j)
        assert perm.to_index(j) == target.index_of_allele(a)
        assert perm.is_kept(j) == (target.index_of_allele(a) is not None)


def test_shuffle_permutation():
    rng = np.random.default_rng(91)
    for trial in range(20):
        alleles = AlleleList(
            random_alleles(rng, int(rng.integers(2, 12)), 4)).as_list()
        if len(alleles) < 2:
            continue
        order = rng.permutation(len(alleles))
        shuffled = [alleles[i] for i in order]
        original = AlleleList(alleles)
        target = AlleleList(shuffled)
        perm = original.permutation(target)
        assert not perm.is_partial()
        assert perm.from_size() == perm.to_size() == len(alleles)
        for i in range(len(alleles)):
            assert perm.from_index(i) == order[i]
            assert perm.to_index(perm.from_index(i)) == i
            assert perm.is_kept(i)


def test_invalid_target_raises():
    a = AlleleList([Allele(b"A", True), Allele(b"C")])
    with pytest.raises(ValueError):
        a.permutation(AlleleList([Allele(b"G")]))
    with pytest.raises(ValueError):
        a.permutation(AlleleList([Allele(b"A", True), Allele(b"C"),
                                  Allele(b"G")]))


def test_index_of_reference_and_dedup():
    a1 = Allele(b"A", True)
    a2 = Allele(b"C")
    al = AlleleList([a2, a1, a2, a1])
    assert al.number_of_alleles() == 2
    assert al.index_of_reference() == 1
    assert al.index_of_allele(a2) == 0
    assert al.contains_allele(a1)
    assert not al.contains_allele(Allele(b"T"))
