"""Sequence-graph simplification suite (seq_graph.rs,
vertex_based_transformer.rs).  The load-bearing invariant: simplification
never changes the set of source->sink path sequences."""
import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph
from lorikeet_tpu.assembly.seq_graph import SeqGraph, find_best_haplotypes_seq


def _diamond_graph():
    sg = SeqGraph()
    a = sg.add_vertex(b"AAA")
    m1 = sg.add_vertex(b"CGTTT")     # shared prefix C, suffix TT... wait
    m2 = sg.add_vertex(b"CATTT")
    z = sg.add_vertex(b"GGG")
    sg.add_edge(a, m1, 5, True)
    sg.add_edge(a, m2, 3)
    sg.add_edge(m1, z, 5, True)
    sg.add_edge(m2, z, 3)
    return sg, a, z


def test_zip_linear_chains():
    sg = SeqGraph()
    a = sg.add_vertex(b"AA")
    b = sg.add_vertex(b"CC")
    c = sg.add_vertex(b"GG")
    sg.add_edge(a, b, 2, True)
    sg.add_edge(b, c, 2, True)
    assert sg.zip_linear_chains()
    assert len(sg.seqs) == 1
    assert list(sg.seqs.values()) == [b"AACCGG"]


def test_merge_diamonds_preserves_paths():
    sg, a, z = _diamond_graph()
    before = sg.all_path_seqs()
    assert sg.merge_diamonds_once()
    sg.zip_linear_chains()
    assert sg.all_path_seqs() == before


def test_simplify_preserves_paths_random():
    """Random kmer graphs from reads with SNPs: path sequences invariant."""
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for trial in range(5):
        ref = bytes(rng.choice(bases, 80).astype(np.uint8))
        alt = bytearray(ref)
        p = int(rng.integers(20, 60))
        alt[p] = ord("ACGT"[(bytes(ref)[p] + 1) % 4])
        g = ReadThreadingGraph(11, 1)
        g.add_sequence(ref, 1, True, "ref")
        g.add_sequence(bytes(alt), 3, False, "alt")
        g.add_sequence(ref, 4, False, "refread")
        g.build()
        g.flush_sample()
        sg = SeqGraph.from_kmer_graph(g)
        before = sg.all_path_seqs()
        sg.simplify()
        assert sg.all_path_seqs() == before, f"trial {trial}"


def test_kbest_on_simplified_graph_recovers_haplotypes():
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bytes(rng.choice(bases, 100).astype(np.uint8))
    alt = bytearray(ref)
    alt[50] = ord("A") if ref[50] != ord("A") else ord("C")
    alt = bytes(alt)
    g = ReadThreadingGraph(15, 1)
    g.add_sequence(ref, 1, True, "ref")
    for _ in range(6):
        g.add_sequence(ref, 1, False, "r")
        g.add_sequence(alt, 1, False, "a")
    g.build()
    g.flush_sample()
    sg = SeqGraph.from_kmer_graph(g).simplify()
    results = find_best_haplotypes_seq(sg)
    seqs = {b for _, b in results}
    assert ref in seqs and alt in seqs


def test_split_common_suffixes():
    sg = SeqGraph()
    m1 = sg.add_vertex(b"AACTTT")
    m2 = sg.add_vertex(b"GGCTTT")
    z = sg.add_vertex(b"CCC")
    sg.add_edge(m1, z, 2)
    sg.add_edge(m2, z, 3)
    before = sg.all_path_seqs()
    assert sg.split_common_suffixes_once(set())
    assert sg.all_path_seqs() == before
    # the common CTTT suffix now lives in its own vertex
    assert b"CTTT" in sg.seqs.values()


def test_merge_tails():
    sg = SeqGraph()
    a = sg.add_vertex(b"AAAA")
    t1 = sg.add_vertex(b"CCCCCGGGGGT")    # >= 10 common bases required
    t2 = sg.add_vertex(b"CCCCCGGGGGA")
    sg.add_edge(a, t1, 1)
    sg.add_edge(a, t2, 1)
    before = sg.all_path_seqs()
    assert sg.merge_tails_once()
    assert sg.all_path_seqs() == before


def test_path_mechanics():
    """Port of path_unit_tests.rs::test_make_path on the SeqGraph: vertex
    paths extend/prepend and concatenate their vertex sequences."""
    sg = SeqGraph()
    v1 = sg.add_vertex(b"a")
    v2 = sg.add_vertex(b"b")
    v3 = sg.add_vertex(b"c")
    v4 = sg.add_vertex(b"d")
    sg.add_edge(v1, v2, 2)
    sg.add_edge(v2, v3, 1)
    sg.add_edge(v3, v4, 1)

    path = [v2]
    path1 = path + [v3]
    path2 = [v1] + path1

    def bases(p):
        return b"".join(sg.seqs[v] for v in p)

    assert len(path) - 1 == 0 and len(path1) - 1 == 1 and len(path2) - 1 == 2
    assert v1 in path2 and v2 in path2 and v3 in path2 and v4 not in path2
    assert v1 not in path1 and v2 in path1 and v3 in path1
    assert path2 != path1
    assert path[0] == v2 and path[-1] == v2
    assert path1[0] == v2 and path1[-1] == v3
    assert bases(path) == b"b"
    assert bases(path2) == b"abc"
