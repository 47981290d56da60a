"""Haplotype-vs-reference CIGAR conformance.

Vectors ported from /root/reference/tests/cigar_utils_unit_tests.rs
test_compute_cigar (CigarUtils::calculate_cigar with OverhangStrategy::InDel
and NEW_SW_PARAMETERS).
"""
import numpy as np
import pytest

from lorikeet_tpu.ops.smith_waterman import OverhangStrategy
from lorikeet_tpu.utils.cigar import calculate_cigar


def b(s):
    return np.frombuffer(s.encode(), np.uint8)


def unparse(cigar):
    return "".join(f"{n}{op}" for op, n in cigar)


@pytest.mark.parametrize("ref,alt,expected", [
    ("ATGGAGGGGC", "ATGGTGGGGC", "10M"),
    ("ATGGAGGGGC", "ATGGAAAATGGGGC", "5M4I5M"),
    ("ATGGAGGGGC", "ATGGAAAAAAAAATGGGGC", "5M9I5M"),
    ("ATGGAAAAAGGGGC", "ATGGTGGGGC", "4M4D6M"),
    ("ATGGAAAAAGGGGC", "ATGGAAAATGGGGC", "14M"),
    ("ATGGAAAAAGGGGC", "ATGGAAAAAAAAATGGGGC", "9M5I5M"),
    ("ATGGAAAAAAAAAAGGGGC", "ATGGTGGGGC", "4M9D6M"),
    ("ATGGAAAAAAAAAAGGGGC", "ATGGAAAATGGGGC", "4M5D10M"),
    ("ATGGAAAAAAAAAAGGGGC", "ATGGAAAAAAAAATGGGGC", "19M"),
    ("NNNTGTGTGTGTGTGTGACAGAGAGAGAGAGAGAGAGAGAGAGAGAGANNN",
     "NNNTGTGTGTGTGTGTGACAGAGAGAGAGAGAGAGAGAGAGAGAGAGANNN", "51M"),
    ("NNNTGTGTGTGTGTGTGACAGAGAGAGAGAGAGAGAGAGAGAGAGAGANNN",
     "NNNACAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGANNN",
     "3M6I48M"),
    ("ATGGAAAAAAAAAATTCCTCCCCCCCCCCCCCAAAAAAAAAAAAGGGGGGGGGGGGCCG",
     "ATGGAAAAAAAAATTTCCTCCCCCCCCCCCCCAAAAAAAAAAAAGGGGGGGGGTGGCCGCCCC",
     "59M4I"),
    ("ATGGAAAAAAAAAATTCCTCCCCCCCCCCCCCAAAAAAAAAAAAGGGGGGGGGGGGCCG",
     "ATGGAAAAAAAAATTTCCTCCCCCCCCCCCCCAAAAAAAAAAAAGGGGGGGGGTGGCCG",
     "59M"),
])
def test_compute_cigar(ref, alt, expected):
    got = calculate_cigar(b(ref), b(alt), strategy=OverhangStrategy.INDEL)
    assert got is not None
    assert unparse(got) == expected
