"""Event-map conformance: MNP merging and overlapping-event queries.

Vectors ported from /root/reference/tests/event_map_unit_tests.rs
(run_mnp_tests, run_overlapping_events_tests).  Positions there are
1-based Locatables; this build is 0-based, so query positions shift by 1.
"""
import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import AssembledHaplotype
from lorikeet_tpu.calling.events import build_event_map


def _hap(bases: str, cigar_str: str, offset=0):
    cigar = []
    n = 0
    for ch in cigar_str:
        if ch.isdigit():
            n = n * 10 + int(ch)
        else:
            cigar.append((ch, n))
            n = 0
    return AssembledHaplotype(bases.encode(), cigar, 0.0, False, 21,
                              alignment_start_offset=offset)


def _events(ref: str, hap_bases: str, cigar: str, max_mnp: int, offset=0):
    ref_a = np.frombuffer(ref.encode(), np.uint8)
    events = build_event_map(_hap(hap_bases, cigar, offset), ref_a, 0,
                             max_mnp)
    return [events[k] for k in sorted(events)]


@pytest.mark.parametrize("ref,hap,cigar,max_dists,expected", [
    ("TTTGGGAAA", "TTTCCCAAA", "3M3X3M", [1, 2, 3, 5, 10],
     [("GGG", "CCC")]),
    ("TTTGGGAAA", "TTTCCCAAA", "3M3X3M", [0],
     [("G", "C"), ("G", "C"), ("G", "C")]),
    ("TTTGGGAAA", "TTTCCCAAA", "9M", [1, 2, 3, 5, 10],
     [("GGG", "CCC")]),
    ("TTTGGGAAA", "TTTCCCAAA", "9M", [0],
     [("G", "C"), ("G", "C"), ("G", "C")]),
    ("TTTTTTTTT", "ATATATATA", "9M", [2],
     [("TTTTTTTTT", "ATATATATA")]),
    ("ACGT", "CGTA", "4M", [1, 2, 3, 5, 10], [("ACGT", "CGTA")]),
    ("ACGT", "CGTA", "4M", [0],
     [("A", "C"), ("C", "G"), ("G", "T"), ("T", "A")]),
    ("ACTTGC", "CATTCG", "6M", [1, 2], [("AC", "CA"), ("GC", "CG")]),
    ("ACTTGC", "CATTCG", "6M", [3, 5, 10], [("ACTTGC", "CATTCG")]),
    ("ACTTGC", "CATTCG", "6M", [0],
     [("A", "C"), ("C", "A"), ("G", "C"), ("C", "G")]),
])
def test_mnps(ref, hap, cigar, max_dists, expected):
    for max_dist in max_dists:
        evs = _events(ref, hap, cigar, max_dist)
        assert len(evs) == len(expected), (max_dist, evs)
        for vc, (eref, ealt) in zip(evs, expected):
            assert vc.alleles[0].bases == eref.encode()
            assert vc.alleles[1].bases == ealt.encode()


# overlapping-events fixtures (reference :59-108): shared ref
# "AAAAAAAAAACGGTCA", haplotype starts at offset 7 into the ref; reference
# query positions are 1-based (10..13) -> 0-based 9..12.
_REF = "AAAAAAAAAACGGTCA"
_OFS = 7


def _overlap(hap_bases, cigar, pos0):
    from lorikeet_tpu.calling.events import get_overlapping_events
    ref_a = np.frombuffer(_REF.encode(), np.uint8)
    events = build_event_map(_hap(hap_bases, cigar, _OFS), ref_a, 0, 1)
    return get_overlapping_events(pos0, events)


@pytest.mark.parametrize("vc1,vc2,expected", [
    # event_map_unit_tests.rs:291-298
    (("A", "G"), ("AGT", "A"), ("AGT", "G")),
    (("A", "G"), ("A", "AGT"), ("A", "GGT")),
    (("AC", "A"), ("A", "AGT"), ("AC", "AGT")),
    (("ACGTA", "A"), ("A", "AG"), ("ACGTA", "AG")),
    (("AC", "A"), ("A", "AGCGT"), ("AC", "AGCGT")),
    (("A", "ACGTA"), ("AG", "A"), ("AG", "ACGTA")),
    (("A", "AC"), ("AGCGT", "A"), ("AGCGT", "AC")),
])
def test_make_block(vc1, vc2, expected):
    from lorikeet_tpu.calling.events import make_block
    from lorikeet_tpu.models.variants import Allele, VariantContext

    def vc(ref, alt):
        return VariantContext(0, 10, 10 + len(ref) - 1,
                              [Allele(ref.encode(), True),
                               Allele(alt.encode(), False)])

    out = make_block(vc(*vc1), vc(*vc2))
    assert out.alleles[0].bases == expected[0].encode()
    assert out.alleles[1].bases == expected[1].encode()


@pytest.mark.parametrize("hap,cigar,pos0,alleles", [
    # hap1: deletion then insertion
    ("AAATTTCA", "3M3D2I3M", 9, ("ACGG", "A")),
    ("AAATTTCA", "3M3D2I3M", 10, ("ACGG", "A")),
    ("AAATTTCA", "3M3D2I3M", 11, ("ACGG", "A")),
    ("AAATTTCA", "3M3D2I3M", 12, ("G", "GTT")),
    # hap2: deletion only
    ("AAATCA", "3M3D3M", 9, ("ACGG", "A")),
    ("AAATCA", "3M3D3M", 10, ("ACGG", "A")),
    ("AAATCA", "3M3D3M", 11, ("ACGG", "A")),
    ("AAATCA", "3M3D3M", 12, ("ACGG", "A")),
    # hap3: SNP only at position 13 (0-based 12)
    ("AAACGATCA", "9M", 9, None),
    ("AAACGATCA", "9M", 10, None),
    ("AAACGATCA", "9M", 11, None),
    ("AAACGATCA", "9M", 12, ("G", "A")),
    # hap4: insertion only
    ("AAACGGTTTCA", "6M2I3M", 9, None),
    ("AAACGGTTTCA", "6M2I3M", 10, None),
    ("AAACGGTTTCA", "6M2I3M", 11, None),
    ("AAACGGTTTCA", "6M2I3M", 12, ("G", "GTT")),
])
def test_overlapping_events(hap, cigar, pos0, alleles):
    found = _overlap(hap, cigar, pos0)
    if alleles is None:
        assert found == []
    else:
        assert len(found) == 1
        vc = found[0]
        assert vc.alleles[0].bases == alleles[0].encode()
        assert vc.alleles[1].bases == alleles[1].encode()
