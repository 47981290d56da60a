"""Port of tests/simple_interval_unit_tests.rs: equality, size, overlap,
margin overlap, contains, contiguous merge, expand_within_contig."""
import pytest

from lorikeet_tpu.utils.intervals import (
    SimpleInterval, parse_limiting_interval,
)


def test_equality():
    assert SimpleInterval(1, 0, 100) == SimpleInterval(1, 0, 100)
    assert SimpleInterval(1, 0, 100) != SimpleInterval(1, 1, 100)
    assert SimpleInterval(1, 0, 100) != SimpleInterval(1, 0, 200)


@pytest.mark.parametrize("iv,size", [
    ((1, 1, 1), 1), ((1, 1, 2), 2), ((1, 1, 10), 10), ((1, 2, 10), 9),
])
def test_interval_size(iv, size):
    assert SimpleInterval(*iv).size() == size


OVERLAP_CASES = [
    # vs standard (1, 10, 20)
    ((1, 10, 20), (2, 10, 20), False), ((1, 10, 20), (1, 1, 5), False),
    ((1, 10, 20), (1, 1, 9), False), ((1, 10, 20), (1, 1, 10), True),
    ((1, 10, 20), (1, 1, 15), True), ((1, 10, 20), (1, 10, 10), True),
    ((1, 10, 20), (1, 10, 15), True), ((1, 10, 20), (1, 10, 20), True),
    ((1, 10, 20), (1, 15, 20), True), ((1, 10, 20), (1, 15, 25), True),
    ((1, 10, 20), (1, 20, 20), True), ((1, 10, 20), (1, 20, 25), True),
    ((1, 10, 20), (1, 21, 25), False), ((1, 10, 20), (1, 25, 30), False),
    # vs one-base (1, 10, 10)
    ((1, 10, 10), (2, 10, 10), False), ((1, 10, 10), (1, 1, 5), False),
    ((1, 10, 10), (1, 1, 9), False), ((1, 10, 10), (1, 1, 10), True),
    ((1, 10, 10), (1, 10, 10), True), ((1, 10, 10), (1, 10, 15), True),
    ((1, 10, 10), (1, 11, 15), False), ((1, 10, 10), (1, 15, 20), False),
]


@pytest.mark.parametrize("a,b,want", OVERLAP_CASES)
def test_overlaps(a, b, want):
    assert SimpleInterval(*a).overlaps(SimpleInterval(*b)) == want


@pytest.mark.parametrize("a,b,margin,want", [
    ((1, 10, 20), (2, 10, 20), 100, False),
    ((1, 10, 20), (1, 1, 15), 0, True),
    ((1, 10, 20), (1, 30, 50), 9, False),
    ((1, 10, 20), (1, 30, 50), 10, True),
    ((1, 100, 200), (1, 50, 99), 0, False),
    ((1, 100, 200), (1, 50, 90), 9, False),
    ((1, 100, 200), (1, 50, 90), 10, True),
])
def test_overlaps_with_margin(a, b, margin, want):
    assert SimpleInterval(*a).overlaps_with_margin(
        SimpleInterval(*b), margin) == want


@pytest.mark.parametrize("b,want", [
    ((2, 10, 20), False), ((1, 1, 5), False), ((1, 1, 10), False),
    ((1, 5, 15), False), ((1, 9, 10), False), ((1, 9, 20), False),
    ((1, 10, 10), True), ((1, 10, 15), True), ((1, 10, 20), True),
    ((1, 10, 21), False), ((1, 15, 25), False), ((1, 20, 20), True),
    ((1, 20, 21), False), ((1, 20, 25), False), ((1, 21, 25), False),
    ((1, 25, 30), False),
])
def test_contains(b, want):
    assert SimpleInterval(1, 10, 20).contains(SimpleInterval(*b)) == want


def test_not_contiguous_loc():
    loc1 = SimpleInterval(1, 10, 20)
    for other in [(1, 22, 30), (1, 31, 40), (2, 20, 30)]:
        with pytest.raises(ValueError):
            loc1.merge_with_contiguous(SimpleInterval(*other))


def test_merge_contiguous():
    loc1 = SimpleInterval(1, 10, 20)
    assert loc1.merge_with_contiguous(SimpleInterval(1, 20, 30)) == \
        SimpleInterval(1, 10, 30)
    assert loc1.merge_with_contiguous(SimpleInterval(1, 21, 30)) == \
        SimpleInterval(1, 10, 30)


L = 10000


@pytest.mark.parametrize("iv,pad,want", [
    ((1, 5, 10), 0, (1, 5, 10)),
    ((1, 5, 10), 1, (1, 4, 11)),
    ((1, 1, 10), 10, (1, 0, 20)),
    ((1, 10, 20), 10, (1, 0, 30)),
    ((1, 10, 20), 9, (1, 1, 29)),
    ((1, 30, 40), 5, (1, 25, 45)),
    ((1, L - 10, L), 10, (1, L - 20, L)),
    ((1, L - 20, L - 10), 11, (1, L - 31, L)),
    ((1, L - 20, L - 10), 10, (1, L - 30, L)),
])
def test_expand_within_contig(iv, pad, want):
    assert SimpleInterval(*iv).expand_within_contig(pad, L) == \
        SimpleInterval(*want)


def test_span_intersect_distance():
    a = SimpleInterval(0, 10, 20)
    b = SimpleInterval(0, 15, 40)
    assert a.span_with(b) == SimpleInterval(0, 10, 40)
    assert a.intersect(b) == SimpleInterval(0, 15, 20)
    assert a.within_distance_of(SimpleInterval(0, 25, 30), 5)
    assert not a.within_distance_of(SimpleInterval(0, 26, 30), 5)


def test_parse_limiting_interval():
    assert parse_limiting_interval("100-200") == SimpleInterval(0, 100, 200)
    assert parse_limiting_interval("100") is None
    assert parse_limiting_interval(None) is None
