"""Adaptive chain-pruner vectors from the reference suite.

Ports /root/reference/tests/chain_pruner_unit_tests.rs
test_adaptive_pruning_with_adjacent_bad_edges and
test_adaptive_chain_pruning_with_bad_bubble: error chains whose edges
meet (so local multiplicities alone don't look like errors) must still be
pruned, while a true variant path must survive.
"""
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph


def _graph(edge_specs, ref_path):
    """Build a ReadThreadingGraph from (u, v, mult, is_ref) specs over
    integer vertex ids 0..n."""
    n = max(max(u, v) for u, v, _, _ in edge_specs) + 1
    g = ReadThreadingGraph(3)
    for i in range(n):
        g._new_vertex(f"v{i}".encode())
    for u, v, mult, is_ref in edge_specs:
        e = g._edge(u, v, is_ref)
        e.inc(mult)
    g.ref_path = ref_path
    g.ref_source, g.ref_sink = ref_path[0], ref_path[-1]
    g.built = True
    return g


def _alive_vertices(g):
    alive = set()
    for u in range(len(g.vertices)):
        for v in g.out_edges[u]:
            alive.add(u)
            alive.add(v)
    return alive


GOOD, VAR, BAD = 1000, 50, 5


@pytest.mark.parametrize("variant_present", [False, True])
def test_adaptive_pruning_with_adjacent_bad_edges(variant_present):
    # source(0) A(1) B(2) C(3) D(4) sink(5) [E(6)]
    edges = [(0, 1, GOOD, True), (1, 2, GOOD, True), (2, 3, GOOD, True),
             (3, 5, GOOD, True),
             (1, 4, BAD, False), (4, 3, BAD, False),   # A->D->C
             (4, 2, BAD, False)]                       # D->B
    if variant_present:
        edges += [(1, 6, VAR, False), (6, 2, VAR, False)]  # A->E->B
    g = _graph(edges, [0, 1, 2, 3, 5])
    g.prune_chains_adaptive(0.01,
                            2.0 / 2.302585,
                            4.0,
                            50)
    alive = _alive_vertices(g)
    assert 4 not in alive, "bad node D must be pruned"
    if variant_present:
        assert 6 in alive, "variant node E must survive"


@pytest.mark.parametrize("variant_present", [False, True])
def test_adaptive_pruning_with_bad_bubble(variant_present):
    # source(0) A(1) B(2) C(3) D(4) E(5) F(6) G(7) sink(8) [H(9)]
    edges = [(0, 1, GOOD, True), (1, 2, GOOD, True), (2, 3, GOOD, True),
             (3, 8, GOOD, True),
             (1, 4, BAD, False),
             (4, 6, BAD, False), (6, 5, BAD, False),   # D->F->E
             (4, 7, BAD, False), (7, 5, BAD, False),   # D->G->E
             (5, 3, BAD, False)]                       # E->C
    if variant_present:
        edges += [(1, 9, VAR, False), (9, 3, VAR, False)]  # A->H->C
    g = _graph(edges, [0, 1, 2, 3, 8])
    g.prune_chains_adaptive(0.01,
                            2.0 / 2.302585,
                            4.0,
                            50)
    alive = _alive_vertices(g)
    for bad in (4, 5, 6, 7):
        assert bad not in alive, f"bad bubble node {bad} must be pruned"
    if variant_present:
        assert 9 in alive, "variant node H must survive"
