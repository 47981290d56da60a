"""CigarBuilder / clip_cigar / alignment_start_shift conformance.

Test vectors ported from the reference suites
/root/reference/tests/cigar_builder_unit_tests.rs and
/root/reference/tests/cigar_utils_unit_tests.rs.
"""
import itertools

import pytest

from lorikeet_tpu.utils.cigar import (
    CigarBuilder, CigarBuilderError, alignment_start_shift, clip_cigar,
)


def parse(s):
    out = []
    n = 0
    for ch in s:
        if ch.isdigit():
            n = n * 10 + int(ch)
        else:
            out.append((ch, n))
            n = 0
    return out


def unparse(cigar):
    return "".join(f"{n}{op}" for op, n in cigar)


def build(element_strings, remove_deletions=True):
    b = CigarBuilder(remove_deletions)
    for s in element_strings:
        for op, n in parse(s):
            b.add(op, n)
    return b


def test_cigar_algebra_simple_concatenation():
    leading = [[], ["10H"], ["10S"], ["10H", "10S"]]
    middle = [["10M"], ["10M", "10I", "10M"], ["10M", "10D", "10M"]]
    trailing = [[], ["10H"], ["10S"], ["10S", "10H"]]
    for lead, mid, tail in itertools.product(leading, middle, trailing):
        elems = lead + mid + tail
        assert unparse(build(elems).make()) == "".join(elems)


@pytest.mark.parametrize("elems,expected", [
    (["10M", "10D"], "10M"),
    (["10D", "10M"], "10M"),
    (["10H", "10D", "10M"], "10H10M"),
    (["10S", "10D", "10M"], "10S10M"),
    (["10S", "10D", "10M", "10S"], "10S10M10S"),
    (["10M", "10D", "10S"], "10M10S"),
    (["10M", "10D", "10H"], "10M10H"),
    (["10S", "10M", "10D", "10H"], "10S10M10H"),
])
def test_initial_and_final_deletion(elems, expected):
    assert unparse(build(elems).make()) == expected


@pytest.mark.parametrize("elems,expected", [
    (["10M", "10D"], "10M10D"),
    (["10D", "10M"], "10D10M"),
    (["10H", "10D", "10M"], "10H10D10M"),
    (["10S", "10D", "10M"], "10S10D10M"),
    (["10S", "10D", "10M", "10S"], "10S10D10M10S"),
    (["10M", "10D", "10S"], "10M10D10S"),
    (["10M", "10D", "10H"], "10M10D10H"),
    (["10S", "10M", "10D", "10H"], "10S10M10D10H"),
])
def test_retain_deletions(elems, expected):
    assert unparse(build(elems, remove_deletions=False).make()) == expected


@pytest.mark.parametrize("elems,expected", [
    (["10H", "10H", "10M"], "20H10M"),
    (["10S", "10M", "10M"], "10S20M"),
    (["10S", "10M", "10S", "10S"], "10S10M20S"),
    (["10S", "10M", "10I", "10I", "10I", "10S", "10H"], "10S10M30I10S10H"),
    (["10S", "10S", "10M", "10M", "10I", "10I", "10S", "10H"],
     "20S20M20I10S10H"),
    # "tricky"
    (["10H", "10H", "10D", "10D", "10M"], "20H10M"),
    # indel sandwich
    (["10M", "10I", "10D", "10M"], "10M10D10I10M"),
    (["10M", "10D", "10I", "10M"], "10M10D10I10M"),
    (["10M", "10I", "10D", "10I", "10M"], "10M10D20I10M"),
    (["10M", "10I", "10D", "10I", "10D", "10I", "10M"], "10M20D30I10M"),
    (["10M", "10I", "10D", "10I", "10M", "10D", "10I", "10M"],
     "10M10D20I10M10D10I10M"),
    # sandwich logic vs leading/trailing deletion removal
    (["10D", "10I", "10M"], "10I10M"),
    (["10M", "10I", "10D"], "10M10I"),
    (["10M", "10D", "10I"], "10M10I"),
    (["10M", "10D", "10I", "10S"], "10M10I10S"),
    (["10S", "10D", "10I", "10M"], "10S10I10M"),
    (["10S", "10I", "10D", "10I", "10M"], "10S20I10M"),
])
def test_merge_consecutive(elems, expected):
    assert unparse(build(elems).make()) == expected


@pytest.mark.parametrize("elems", [
    ["10S"], ["10S", "10S"],                       # completely soft-clipped
    ["10S", "10D"], ["10S", "10D", "10S"],         # completely clipped
    ["10S", "10D", "10D", "10S"],
    ["10S", "10H", "10M"], ["10M", "10H", "10S"],  # wrong clip order
    ["10M", "10H", "10M"], ["10M", "10S", "10M"],  # clip mid-read
])
def test_invalid(elems):
    with pytest.raises(CigarBuilderError):
        build(elems).make()


@pytest.mark.parametrize("elems,lead,trail", [
    (["10M"], 0, 0),
    (["10S", "10M"], 0, 0),
    (["10M", "10S"], 0, 0),
    (["10M", "10I", "10D", "10M"], 0, 0),
    (["10M", "10D", "10I", "10M"], 0, 0),
    (["10D", "10I", "10M"], 10, 0),
    (["10D", "10D", "10I", "10M"], 20, 0),
    (["10D", "10D", "10I", "10D", "10M"], 30, 0),
    (["10S", "10D", "10D", "10I", "10D", "10M"], 30, 0),
    (["10M", "10I", "10D"], 0, 10),
    (["10M", "10D", "10I"], 0, 10),
    (["10M", "10D", "10I", "10D"], 0, 20),
    (["10M", "10D", "10I", "10D", "10S", "10H"], 0, 20),
    (["10H", "10S", "10D", "10M", "10D", "10I", "10D", "10S", "10H"],
     10, 20),
])
def test_removed_deletions(elems, lead, trail):
    b = build(elems)
    b.make()
    assert b.leading_deletion_bases_removed == lead
    assert b.trailing_deletion_bases_removed == trail


@pytest.mark.parametrize("part1,part2,lead,trail", [
    (["10M"], ["10M"], 0, 0),
    (["10M", "10I"], ["10D", "10M"], 0, 0),
    (["10M", "10D"], ["10I", "10M"], 0, 0),
    (["10D", "10I"], ["10M"], 10, 0),
    (["10D", "10D", "10I"], ["10D", "10M"], 30, 0),
    (["10H", "10S", "10D", "10M"],
     ["10D", "10I", "10D", "10S", "10H"], 10, 20),
])
def test_removed_deletions_two_makes(part1, part2, lead, trail):
    b = build(part1)
    b.make()
    for s in part2:
        for op, n in parse(s):
            b.add(op, n)
    b.make()
    assert b.leading_deletion_bases_removed == lead
    assert b.trailing_deletion_bases_removed == trail


@pytest.mark.parametrize("original,start,stop,soft,hard", [
    # simple cases
    ("10M", 0, 5, "5S5M", "5H5M"),
    ("10M", 5, 10, "5M5S", "5M5H"),
    ("10H10M", 0, 5, "10H5S5M", "15H5M"),
    ("10H10M", 5, 10, "10H5M5S", "10H5M5H"),
    ("10M10H", 0, 5, "5S5M10H", "5H5M10H"),
    # clipping into insertion
    ("10M10I10M", 0, 5, "5S5M10I10M", "5H5M10I10M"),
    ("10M10I10M", 0, 15, "15S5I10M", "15H5I10M"),
    ("10M10I10M", 15, 30, "10M5I15S", "10M5I15H"),
    # clipping into a soft clip
    ("10S10M10S", 0, 5, "10S10M10S", "5H5S10M10S"),
    ("10S10M10S", 25, 30, "10S10M10S", "10S10M5S5H"),
    ("10S10M10S", 0, 15, "15S5M10S", "15H5M10S"),
    # clipping over a deletion
    ("10M10D10M", 0, 10, "10S10M", "10H10M"),
    ("10M10D10M", 0, 15, "15S5M", "15H5M"),
    ("10M10D10M", 5, 20, "5M15S", "5M15H"),
    # removing leading deletions
    ("10D10M", 0, 5, "5S5M", "5H5M"),
])
def test_clip_cigar(original, start, stop, soft, hard):
    assert unparse(clip_cigar(parse(original), start, stop, "S")) == soft
    assert unparse(clip_cigar(parse(original), start, stop, "H")) == hard


@pytest.mark.parametrize("cigar,num_clips,expected", [
    ("70M", 10, 10),
    ("70M", 0, 0),
    ("30M10D30M", 29, 29),
    ("30M10D30M", 30, 40),
    ("30M10D30M", 31, 41),
    ("30M10I30M", 30, 30),
    ("30M10I30M", 31, 30),
    ("30M10I30M", 40, 30),
    ("30M10I30M", 41, 31),
    ("10H10M", 5, 5),
    ("10S10M", 5, 0),
])
def test_alignment_start_shift(cigar, num_clips, expected):
    assert alignment_start_shift(parse(cigar), num_clips) == expected
