"""Read-threading graph vectors, ported from the reference suite
(tests/read_threading_graph_unit_tests.rs: test_simple_haplotype_rethreading
:61, test_non_unique_middle :109, test_cycles_in_graph :339,
test_empty_read_being_added_to_graph :405,
test_Ns_in_reads_are_not_used_for_graph :448)."""
from unittest import mock

import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph
from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.native import graph_native

REF_B37 = ("CAATTGTCATAGAGAGTGACAAATGTTTCAAAAGCTTATTGACCCCAAGGTGCAGCGGTG"
           "CACATTAGAGGGCACCTAAGACAGCCTACAGGGGTCAGAAAAGATGTCTCAGAGGGACTC"
           "ACACCTGAGCTGAGTTGTGAAGGAAGAGCAGGATAGAATGAGCCAAAGATAAAGACTCCA"
           "GGCAAAAGCAAATGAGCCTGAGGGAAACTGGAGCCAAGGCAAGAGCAGCAGAAAAGAGCA"
           "AAGCCAGCCGGTGGTCAAGGTGGGCTACTGTGTATGCAGAATGAGGAAGCTGGCCAAGTA"
           "GACATGTTTCAGATGATGAACATCCTGTATACTAGATGCATTGGAACTTTTTTCATCCCC"
           "TCAACTCCACCAAGCCTCTGTCCACTCTTGGTACCTCTCTCCAAGTAGACATATTTCAGA"
           "TCATGAACATCCTGTGTACTAGATGCATTGGAAATTTTTTCATCCCCTCAACTCCACCCA"
           "GCCTCTGTCCACACTTGGTACCTCTCTCTATTCATATCTCTGGCCTCAAGGAGGGTATTT"
           "GGCATTAGTAAATAAATTCCAGAGATACTAAAGTCAGATTTTCTAAGACTGGGTGAATGA"
           "CTCCATGGAAGAAGTGAAAAAGAGGAAGTTGTAATAGGGAGACCTCTTCGG").encode()
# SNP at offset 328 (A->G relative to REF_B37) creates small-kmer cycles
ALT_B37 = REF_B37[:328] + b"G" + REF_B37[329:]


def _read(bases, name="r"):
    seq = np.frombuffer(bases, np.uint8).copy()
    return BamRecord(name=name, flag=0, tid=0, pos=0, mapq=60,
                     cigar=[("M", len(seq))], seq=seq,
                     qual=np.full(len(seq), 30, np.uint8))


@pytest.mark.parametrize("force_python", [False, True],
                         ids=["native", "python"])
def test_simple_haplotype_rethreading(force_python):
    reference = b"CATGCACTTTAAAACTTGCCTTTTTAACAAGACTTCCAGATG"
    alternate = b"CATGCACTTTAAAACTTGCCGTTTTAACAAGACTTCCAGATG"
    g = ReadThreadingGraph(11)
    g.add_sequence(reference, 1, True, "ref")
    g.add_sequence(alternate, 1, False, "alt")
    if force_python:
        with mock.patch.object(graph_native, "build_graph_native3",
                               lambda *a, **k: None):
            g.build()
    else:
        g.build()
    # the SNP adds exactly kmer_size new vertices
    assert len(g.vertices) == len(reference) - 11 + 1 + 11
    assert alternate[20:31] in g.vertices


def test_non_unique_middle():
    g = ReadThreadingGraph(3)
    g.add_sequence(b"GACACACAGTCA", 1, True, "ref")
    g.add_sequence(b"GACACGTCA", 1, False, "r1")
    g.add_sequence(b"CACGTCA", 1, False, "r2")
    with mock.patch.object(graph_native, "build_graph_native3",
                           lambda *a, **k: None):
        g.build()
    assert g.non_unique == {b"ACA", b"CAC"}


@pytest.mark.parametrize("force_python", [False, True],
                         ids=["native", "python"])
def test_cycles_in_graph(force_python):
    reads = [_read(ALT_B37[i:i + 100], f"r{i}")
             for i in range(0, len(ALT_B37) - 100, 20)]
    verdicts = {}
    for k in (25, 75):
        g = ReadThreadingGraph(k)
        g.add_sequence(REF_B37, 1, True, "ref")
        for r in reads:
            g.add_read(r, min_base_quality=10)
        if force_python:
            with mock.patch.object(graph_native, "build_graph_native3",
                                   lambda *a, **kk: None):
                g.build()
        else:
            g.build()
        cyc = g.cycle_checked if g.cycle_checked is not None \
            else g.has_cycle()
        verdicts[k] = cyc
    assert verdicts[25] is True or verdicts[25] == 1
    assert not verdicts[75]


def test_empty_read_added_to_graph_does_not_crash():
    reads = [_read(ALT_B37[i:i + 100], f"r{i}")
             for i in range(0, len(ALT_B37) - 100, 20)]
    empty = BamRecord(name="empty", flag=0, tid=0, pos=0, mapq=60,
                      cigar=[], seq=np.zeros(0, np.uint8),
                      qual=np.zeros(0, np.uint8))
    g = ReadThreadingGraph(25)
    g.add_sequence(REF_B37, 1, True, "ref")
    for r in reads + [empty]:
        g.add_read(r, min_base_quality=10)
    g.build()
    cyc = g.cycle_checked if g.cycle_checked is not None else g.has_cycle()
    assert cyc


def test_ns_in_reads_are_not_used_for_graph():
    length = 100
    reference = b"A" * length
    g = ReadThreadingGraph(25)
    g.add_sequence(reference, 1, True, "ref")
    for i in range(length):
        bases = bytearray(reference)
        bases[i] = ord("N")
        g.add_read(_read(bytes(bases), f"n{i}"), min_base_quality=10)
    g.build()
    cyc = g.cycle_checked if g.cycle_checked is not None else g.has_cycle()
    assert not cyc
    from lorikeet_tpu.assembly.seq_graph import (
        SeqGraph, find_best_haplotypes_seq,
    )
    sg = SeqGraph.from_kmer_graph(g)
    sg.simplify()
    paths = find_best_haplotypes_seq(sg, 128)
    assert len(paths) == 1


def test_low_quality_graph_gate():
    """is_low_quality_graph (read_threading_graph.rs:261-263): a repeat-
    heavy window has non_unique*4 > unique-map at small k; a random window
    does not."""
    rng = np.random.default_rng(4)
    bases = np.frombuffer(b"ACGT", np.uint8)
    rep = bytes(bases[rng.integers(0, 4, 8)]) * 20     # 8bp unit x 20
    g = ReadThreadingGraph(11)
    g.add_sequence(rep, 1, True, "ref")
    g.build()
    assert g.is_low_quality_graph()

    rand = bytes(bases[rng.integers(0, 4, 200)])
    g2 = ReadThreadingGraph(11)
    g2.add_sequence(rand, 1, True, "ref")
    g2.build()
    assert not g2.is_low_quality_graph()
