"""Seq-graph simplification vectors from the reference suite.

Ports /root/reference/tests/seq_graph_unit_tests.rs:
make_merge_nodes_with_no_variation_test (a no-variation threading graph
simplifies to a single node spelling the sequence) and
test_bubble_same_bases_with_ref (identical-base bubbles collapse).
"""
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph
from lorikeet_tpu.assembly.seq_graph import SeqGraph

LONG = (b"AATACCATTGGAGTTTTTTTCCAGGTTAAGATGGTGCATTGAATCCACCCATCTACTTTTG"
        b"CTCCTCCCAAAACTCACTAAAACTATTATAAAGGGATTTTGTTTAAAGACACAAACTCATG"
        b"AGGACAGAGAGAACAGAGTAGACAATAGTGGGGGAAAAATAAGTTGGAAGATAGAAAACAG"
        b"ATGGGTGAGTGGTAATCGACTCAGCAGCCCCAAGAAAGCTGAAACCCAGGGAAAGTTAAGA"
        b"GTAGCCCTATTTTCATGGCAAAATCCAAGGGGGGGTGGGGAAAGAAAGAAAAACAGAAAAA"
        b"AAAATGGGAATTGGCAGTCCTAGATATCTCTGGTACTGGGCAAGCCAAAGAATCAGGATAA"
        b"CTGGGTGAAAGGTGATTGGGAAGCAGTTAAAATCTTAGTTCCCCTCTTCCACTCTCCGAGC"
        b"AGCAGGTTTCTCTCTCTCATCAGGCAGAGGGCTGGAGAT")


@pytest.mark.parametrize("seq,k", [
    (b"GGTTAACC", 3), (b"GGTTAACC", 4), (b"GGTTAACC", 5),
    (b"GGTTAACC", 6), (b"GGTTAACC", 7),
    (b"GGTTAACCATGCAGACGGGAGGCTGAGCGAGAGTTTT", 6),
    (LONG, 66), (LONG, 76),
])
def test_merge_nodes_with_no_variation(seq, k):
    g = ReadThreadingGraph(k)
    g.add_sequence(seq, 1, True, "ref")
    g.build()
    sg = SeqGraph.from_kmer_graph(g)
    sg.simplify()
    assert len(sg.seqs) == 1, sg.seqs
    assert list(sg.seqs.values())[0] == seq


def test_bubble_same_bases_with_ref():
    sg = SeqGraph()
    top = sg.add_vertex(b"A")
    mid1 = sg.add_vertex(b"ACT")
    mid2 = sg.add_vertex(b"ACT")
    bot = sg.add_vertex(b"C")
    sg.add_edge(top, mid1, 1, True)
    sg.add_edge(mid1, bot, 1, True)
    sg.add_edge(top, mid2, 1, False)
    sg.add_edge(mid2, bot, 1, False)
    sg.simplify()
    assert len(sg.seqs) == 1, sg.seqs
    assert list(sg.seqs.values())[0] == b"AACTC"
