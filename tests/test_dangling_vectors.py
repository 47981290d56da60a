"""Dangling tail/head recovery vectors, ported at the behavior level from
the reference suite (tests/read_threading_graph_unit_tests.rs:
make_dangling_tails_data :666-685 and make_dangling_heads_data :1071-1115
against abstract_read_threading_graph.rs:231-455): after building the
graph from a reference plus one full-M alternate read, recovery must merge
the dangling end back into the reference path exactly when the reference
expects it (cigar acceptable AND a merge point exists)."""
from unittest import mock

import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph
from lorikeet_tpu.native import graph_native

COMMON_PREFIX = b"AAAAAAAAAACCCCCCCCCCGGGGGGGGGGTTTTTTTTTT"

# (ref_end, alt_end, expected_merge, min_matching_bases)
# expected_merge = cigar_is_good && merge_point_distance >= 0 in the
# reference's parameter list
TAIL_CASES = [
    (b"AAAAAAAAAA", b"CAAA", True, -1),            # incomplete haplotype
    (b"AAAAAAAAAA", b"CAAAAAAAAAA", True, -1),     # insertion
    (b"CCAAAAAAAAAA", b"AAAAAAAAAA", True, -1),    # deletion
    (b"AAAAAAAA", b"CAAAAAAA", True, -1),          # 1 snp
    (b"AAAAAAAA", b"CAAGATAA", True, -1),          # several snps
    (b"AAAAAAAA", b"CAAGATAA", True, 0),
    (b"AAAAAAAA", b"CAAGATAA", True, 1),
    (b"AAAAAAAA", b"CAAGATAA", True, 2),
    (b"AAAAAAAA", b"CAAGATAA", False, 3),          # not enough matches
    (b"AAAAAAAA", b"CAAGATAA", False, 4),
    (b"AAAAA", b"C", False, -1),                   # funky SW alignment
    (b"AAAAAAA", b"CAAAAAC", False, -1),           # ends in mismatch
    (b"AAAAA", b"YYYYY", False, -1),               # all mismatch
]

# (reference, alternate, expected_merge, min_matching_bases) — kmer 5
HEAD_CASES = [
    (b"XXXXXXXAACCGGTTACGT", b"AAYCGGTTACGT", True, -1),   # 1 snp
    (b"XXXXXXXAACCGGTTACGT", b"AAYCGGTTACGT", True, 0),
    (b"XXXXXXXAACCGGTTACGT", b"AAYCGGTTACGT", True, 1),
    (b"XXXXXXXAACCGGTTACGT", b"AAYCGGTTACGT", True, 2),
    (b"XXXXXXXAACCGGTTACGT", b"AAYCGGTTACGT", False, 3),
    (b"YYYYYYYAACCGGTTACGT", b"AYYCGGTTACGT", False, -1),  # 2 snps legacy
    (b"YYYYYYYAACCGGTTACGT", b"AYYCGGTTACGT", True, 1),    # 2 snps new
    (b"YYYYYYYAACCGGTTACGT", b"AYCGGTTACGT", True, -1),    # very little data
    (b"YYYYYYYAACCGGTTACGT", b"YCCGGTTACGT", True, -1),    # begins mismatch
]


def _build(reference, alternate, k, min_matching, force_python):
    g = ReadThreadingGraph(k, start_only_at_existing=False)
    g.add_sequence(reference, 1, True, "ref")
    g.add_sequence(alternate, 1, False, "alt")
    if force_python:
        with mock.patch.object(graph_native, "build_graph_native2",
                               lambda *a, **kk: None):
            g.build()
    else:
        g.build()
    recovered = g.recover_dangling_ends(min_dangling_branch_length=1,
                                        min_matching_bases=min_matching)
    return g, recovered


@pytest.mark.parametrize("force_python", [False, True],
                         ids=["native", "python"])
@pytest.mark.parametrize("ref_end,alt_end,expect,minm", TAIL_CASES,
                         ids=lambda v: v.decode() if isinstance(v, bytes)
                         else str(v))
def test_dangling_tail_vectors(ref_end, alt_end, expect, minm,
                               force_python):
    reference = COMMON_PREFIX + ref_end
    alternate = COMMON_PREFIX + alt_end
    g, recovered = _build(reference, alternate, 15, minm, force_python)
    assert (recovered > 0) == expect, (ref_end, alt_end, minm)


@pytest.mark.parametrize("force_python", [False, True],
                         ids=["native", "python"])
@pytest.mark.parametrize("reference,alternate,expect,minm", HEAD_CASES,
                         ids=lambda v: v.decode() if isinstance(v, bytes)
                         else str(v))
def test_dangling_head_vectors(reference, alternate, expect, minm,
                               force_python):
    g, recovered = _build(reference, alternate, 5, minm, force_python)
    assert (recovered > 0) == expect, (reference, alternate, minm)
