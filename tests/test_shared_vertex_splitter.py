"""Shared-vertex sequence splitting, ported from the reference suite
(tests/shared_vertex_sequence_splitter_unit_tests.rs:
make_prefix_suffix_data vectors :44-66, make_splitter_data :134-156, and
the haplotype-preservation property of test_splitter_complete_cycle
:158-280 — splitting middles between a top and bottom vertex must not
change the set of path sequences through the graph)."""
import pytest

from lorikeet_tpu.assembly.seq_graph import SeqGraph

PREFIX_SUFFIX_VECTORS = [
    (["A", "C"], 0, 0),
    (["C", "C"], 1, 0),
    (["ACT", "AGT"], 1, 1),
    (["ACCT", "AGT"], 1, 1),
    (["ACT", "ACT"], 3, 0),
    (["ACTA", "ACT"], 3, 0),
    (["ACTA", "ACTG"], 3, 0),
    (["ACTA", "ACTGA"], 3, 1),
    (["GCTGA", "ACTGA"], 0, 4),
    (["A", "C", "A"], 0, 0),
    (["A", "A", "A"], 1, 0),
    (["A", "AA", "A"], 1, 0),
    (["A", "ACA", "A"], 1, 0),
    (["ACT", "ACAT", "ACT"], 2, 1),
    (["ACT", "ACAT", "ACGT"], 2, 1),
    (["AAAT", "AAA", "CAAA"], 0, 0),
    (["AACTTT", "AAGTTT", "AAGCTTT"], 2, 3),
    (["AAA", "AAA", "CAAA"], 0, 3),
    (["AAA", "AAA", "AAA"], 3, 0),
    (["AC", "ACA", "AC"], 2, 0),
]


@pytest.mark.parametrize("strings,plen,slen", PREFIX_SUFFIX_VECTORS,
                         ids=lambda v: "-".join(v) if isinstance(v, list)
                         else str(v))
def test_prefix_suffix_vectors(strings, plen, slen):
    seqs = [s.encode() for s in strings]
    prefix = SeqGraph._common_prefix(seqs)
    assert len(prefix) == plen, (strings, prefix)
    suffix = SeqGraph._common_suffix(seqs, reserve=len(prefix))
    assert len(suffix) == slen, (strings, suffix)
    assert prefix == seqs[0][:plen]
    assert suffix == seqs[0][len(seqs[0]) - slen:] if slen else suffix == b""


def _build_diamond(strings, with_bottom=True):
    """top -> each middle -> bottom (the complete-cycle layout, reference
    :158-210); first middle's edges are the reference path."""
    sg = SeqGraph()
    top = sg.add_vertex(b"AAAAAAAA")
    mids = [sg.add_vertex(s.encode()) for s in strings]
    bot = sg.add_vertex(b"GGGGGGGG") if with_bottom else None
    w = 1
    for i, m in enumerate(mids):
        sg.add_edge(top, m, w, i == 0)
        w += 1
    if with_bottom:
        for i, m in enumerate(mids):
            sg.add_edge(m, bot, w, i == 0)
            w += 1
    return sg, top, mids, bot


@pytest.mark.parametrize("strings,plen,slen", PREFIX_SUFFIX_VECTORS,
                         ids=lambda v: "-".join(v) if isinstance(v, list)
                         else str(v))
@pytest.mark.parametrize("with_bottom", [True, False],
                         ids=["bot", "nobot"])
def test_split_preserves_path_sequences(strings, plen, slen, with_bottom):
    sg, top, mids, bot = _build_diamond(strings, with_bottom)
    before = sg.all_path_seqs()
    changed = sg._split_middles(mids, top, bot, require_min_common=False)
    if plen == 0 and slen == 0:
        assert not changed
        return
    assert changed
    after = sg.all_path_seqs()
    assert after == before, (strings, before, after)


def test_split_creates_prefix_and_suffix_vertices():
    # AACTTT/AAGTTT/AAGCTTT: prefix AA, suffix TTT (reference :152)
    sg, top, mids, bot = _build_diamond(["AACTTT", "AAGTTT", "AAGCTTT"])
    assert sg._split_middles(mids, top, bot, require_min_common=False)
    seqs = set(sg.seqs.values())
    assert b"AA" in seqs and b"TTT" in seqs
    # cores: C / G / GC
    assert {b"C", b"G", b"GC"} <= seqs
