"""K-best haplotype finder vectors.

Ports the score semantics of /root/reference/tests/
graph_based_k_best_haplotype_finder_unit_tests.rs (test_score,
test_dead_node): path score = sum of log10(edge multiplicity / total
outgoing multiplicity) at each branch.
"""
import numpy as np

from lorikeet_tpu.assembly.seq_graph import SeqGraph, find_best_haplotypes_seq


def test_score_log10_fraction_of_outgoing():
    sg = SeqGraph()
    a = sg.add_vertex(b"A")
    c = sg.add_vertex(b"C")
    g = sg.add_vertex(b"G")
    t = sg.add_vertex(b"T")
    a2 = sg.add_vertex(b"A")
    sg.add_edge(a, c, 1, True)
    sg.add_edge(c, g, 1, True)     # ref path A-C-G
    sg.add_edge(c, t, 1, False)
    sg.add_edge(c, a2, 1, False)
    results = dict()
    for score, bases in find_best_haplotypes_seq(sg, 10):
        results[bases] = score
    assert b"ACG" in results
    # one of three equally weighted branches: log10(1/3)
    assert abs(results[b"ACG"] - (-0.47712125471966244)) < 1e-12


def test_weighted_branch_scores():
    sg = SeqGraph()
    a = sg.add_vertex(b"A")
    c = sg.add_vertex(b"C")
    g = sg.add_vertex(b"G")
    t = sg.add_vertex(b"T")
    sg.add_edge(a, c, 5, True)
    sg.add_edge(c, g, 9, True)
    sg.add_edge(c, t, 1, False)
    res = dict()
    for score, bases in find_best_haplotypes_seq(sg, 10):
        res[bases] = score
    assert abs(res[b"ACG"] - np.log10(0.9)) < 1e-12
    # best-first ordering
    ordered = find_best_haplotypes_seq(sg, 10)
    assert ordered[0][1] == b"ACG"


def test_dead_node_does_not_break_search():
    # a branch that cannot reach the ref sink is simply never emitted
    sg = SeqGraph()
    a = sg.add_vertex(b"A")
    c = sg.add_vertex(b"C")
    g = sg.add_vertex(b"G")
    dead = sg.add_vertex(b"T")
    sg.add_edge(a, c, 1, True)
    sg.add_edge(c, g, 1, True)
    sg.add_edge(c, dead, 5, False)
    dead2 = sg.add_vertex(b"T")
    sg.add_edge(dead, dead2, 5, False)   # dead chain, never reaches sink
    res = [bases for _, bases in find_best_haplotypes_seq(sg, 10)]
    assert res == [b"ACG"]
