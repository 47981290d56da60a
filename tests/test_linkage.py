"""Linkage engine tests: variant-group graph construction and the rising
water-table strain traversal (linkage_engine.rs:73-421,889-1147)."""
import numpy as np

from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext
from lorikeet_tpu.strain.linkage import (
    LinkageEngine, build_graph, get_reads_for_groups,
)


def _vc(tid, pos, ref, alt, ad=(5, 20)):
    g = Genotype(0, 2)
    g.ad = list(ad)
    vc = VariantContext(tid, pos, pos + len(ref) - 1,
                        [Allele(ref, True), Allele(alt, False)], [g])
    return vc


class FakeBam:
    """Duck-typed BamReader exposing fetch() over synthetic records."""

    class Rec:
        def __init__(self, name, pos, seq):
            self.name = name
            self.pos = pos
            self.seq = np.frombuffer(seq, np.uint8)
            self.is_unmapped = False

        @property
        def reference_end(self):
            return self.pos + len(self.seq)

    def __init__(self, records):
        self.records = records  # {tid: [Rec]}

    def fetch(self, tid, start, end):
        for r in self.records.get(tid, []):
            if r.pos < end and r.reference_end > start:
                yield r


def test_get_reads_for_groups_matches_alt_carriers():
    # group 0: variant at pos 10 expecting alt "T"
    vc = _vc(0, 10, b"A", b"T")
    bam = FakeBam({0: [
        FakeBam.Rec("r1", 5, b"CCCCCTCCCC"),   # pos 10 -> offset 5 = 'T': match
        FakeBam.Rec("r2", 5, b"CCCCCACCCC"),   # offset 5 = 'A': no match
        FakeBam.Rec("r3", 8, b"CCTCC"),        # offset 2 = 'T': match
    ]})
    reads, depth = get_reads_for_groups({0: [vc]}, [bam])
    assert reads[0] == {"0_r1", "0_r3"}
    # allele depth (20) exceeds matched count (2) -> mean depth = 20
    assert depth[0] == 20.0


def test_build_graph_direction_and_weight():
    reads = {0: {"a", "b", "c", "d"}, 1: {"c", "d", "e"}}
    depth = {0: 30.0, 1: 10.0}
    nodes, edges = build_graph(reads, depth)
    assert set(nodes) == {0, 1}
    assert list(edges) == [(0, 1)]          # high depth -> low depth
    w = edges[(0, 1)]
    base = 1.0 - 2.0 / 5.0                  # jaccard distance
    depth_factor = 1.0 - np.log(10.0) / np.log(30.0)
    assert np.isclose(w, base + base * depth_factor)


def test_build_graph_no_sharing_no_edge():
    reads = {0: {"a"}, 1: {"b"}}
    nodes, edges = build_graph(reads, {0: 5.0, 1: 3.0})
    assert edges == {}


def test_no_edges_identity_strains():
    eng = LinkageEngine({0: [], 1: []})
    eng.mean_depth = {0: 5.0, 1: 3.0}
    strains = eng.compute_strain_denominations([0, 1], {})
    # no edges handled upstream; direct call treats isolated nodes
    assert sorted(map(sorted, strains)) == [[0], [1]]


def test_water_table_chain_single_strain():
    # A(30) -> B(20) -> C(10): one linked strain spanning all three groups
    eng = LinkageEngine({g: [] for g in (0, 1, 2)})
    eng.mean_depth = {0: 30.0, 1: 20.0, 2: 10.0}
    edges = {(0, 1): 0.2, (1, 2): 0.2}
    strains = eng.compute_strain_denominations([0, 1, 2], edges)
    assert [0, 1, 2] in strains
    assert len(strains) == 1


def test_water_table_two_components():
    # two chains: {0->1} and {2->3}; each becomes its own strain
    eng = LinkageEngine({g: [] for g in range(4)})
    eng.mean_depth = {0: 30.0, 1: 20.0, 2: 8.0, 3: 4.0}
    edges = {(0, 1): 0.1, (2, 3): 0.1}
    strains = eng.compute_strain_denominations([0, 1, 2, 3], edges)
    assert sorted(map(sorted, strains)) == [[0, 1], [2, 3]]


def test_run_linkage_end_to_end_two_strains():
    """Two variants supported by disjoint read populations stay separate;
    two supported by the same reads merge into one strain."""
    # linked pair at pos 10/30 (same reads), isolated variant at pos 200
    vc_a = _vc(0, 10, b"A", b"T", ad=(0, 3))
    vc_b = _vc(0, 30, b"G", b"C", ad=(0, 3))
    vc_c = _vc(0, 200, b"A", b"G", ad=(0, 2))
    seq_ab = bytearray(b"A" * 50)
    seq_ab[10] = ord("T")
    seq_ab[30] = ord("C")
    recs0 = [FakeBam.Rec(f"p{i}", 0, bytes(seq_ab)) for i in range(3)]
    recs1 = [FakeBam.Rec(f"q{i}", 190, b"AAAAAAAAAAGAAAAAAAAA")
             for i in range(2)]
    bam = FakeBam({0: recs0 + recs1})
    eng = LinkageEngine({0: [vc_a], 1: [vc_b], 2: [vc_c]})
    strains = eng.run_linkage([bam])
    merged = [sorted(s) for s in strains]
    assert [0, 1] in merged
    assert [2] in merged
