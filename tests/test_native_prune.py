"""Native graph build2 (C++ per-sample flush + cycle check + low-weight
chain pruning) must agree with the pure-Python path
(multi_sample_edge.rs flush/pruning semantics, chain_pruner.rs:58-121,
graph.py prune_low_weight_chains/_remove_orphans)."""
import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph
from lorikeet_tpu.native import graph_native

pytestmark = pytest.mark.skipif(not graph_native.native_available(),
                                reason="native toolchain absent")

BASES = np.frombuffer(b"ACGT", np.uint8)


def _random_case(seed, n_samples=2, n_reads=14, L=160, k=15):
    rng = np.random.default_rng(seed)
    ref = bytes(BASES[rng.integers(0, 4, L)])
    alt = bytearray(ref)
    p = int(rng.integers(30, L - 30))
    alt[p] = ord("T") if alt[p] != ord("T") else ord("G")
    alt = bytes(alt)
    seqs = []
    for s in range(n_samples):
        for r in range(n_reads):
            src = alt if rng.random() < 0.5 else ref
            st = int(rng.integers(0, L - 60))
            seq = bytearray(src[st:st + 60])
            if rng.random() < 0.3:  # sequencing error
                q = int(rng.integers(0, len(seq)))
                seq[q] = BASES[rng.integers(0, 4)]
            seqs.append((f"r{s}_{r}", bytes(seq), s))
    return ref, seqs


def _edge_set(g):
    out = set()
    for u in range(len(g.vertices)):
        for v, e in g.out_edges[u].items():
            out.add((g.vertices[u], g.vertices[v], e.multiplicity,
                     e.is_ref))
    return out


def _graphs(ref, seqs, k, nps, prune_factor, force_python):
    g = ReadThreadingGraph(k, num_pruning_samples=nps)
    g.add_sequence(ref, 1, True, "ref")
    for name, seq, sid in seqs:
        if len(seq) >= k:
            g.add_sequence(seq, 1, False, name, sample_id=sid)
    if force_python:
        import lorikeet_tpu.assembly.graph as G
        from unittest import mock
        with mock.patch.object(graph_native, "build_graph_native3",
                               lambda *a, **k2: None):
            g.build()
        assert g.cycle_checked is None  # proves the python path ran
        g.flush_sample()
        cyc = g.has_cycle()
        if not cyc:
            g.prune_low_weight_chains(prune_factor)
        return g, cyc
    g.build(prune_factor=prune_factor)
    if not g.native_pruned:
        g.flush_sample()
    return g, g.cycle_checked


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("nps,factor", [(1, 2), (2, 2), (1, 1)])
def test_native_matches_python(seed, nps, factor):
    ref, seqs = _random_case(seed, n_samples=2)
    gp, cyc_p = _graphs(ref, seqs, 15, nps, factor, force_python=True)
    gn, cyc_n = _graphs(ref, seqs, 15, nps, factor, force_python=False)
    assert cyc_n == cyc_p
    if cyc_p:
        return
    # python prune leaves disconnected vertices; compare surviving edges
    assert _edge_set(gn) == _edge_set(gp)


def test_native_reports_cycle():
    # a repeat that folds back on itself at small k
    ref = b"ACGTACGTACGTACGTACGTGGG"
    g = ReadThreadingGraph(4)
    g.add_sequence(ref, 1, True, "ref")
    g.add_sequence(b"ACGTACGTACGT", 1, False, "r", sample_id=0)
    g.build(prune_factor=2)
    if g.cycle_checked is None:
        pytest.skip("python fallback")
    assert g.cycle_checked == g.has_cycle()
