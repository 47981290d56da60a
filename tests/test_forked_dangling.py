"""Forked dangling-tail recovery, ported at the behavior level from the
reference suite (tests/read_threading_graph_unit_tests.rs:
test_forked_dangling_ends :785-878 — with recover-all on, both forks of a
shared dangling tail merge back and k-best recovers exactly
{ref, alt1, alt2}; test_forked_dangling_ends_with_suffix_code :687-783 —
the degenerate fork whose suffix match is empty must NOT merge)."""
from lorikeet_tpu.assembly.graph import ReadThreadingGraph, find_best_haplotypes

COMMON_PREFIX = b"AAAAAAAAAACCCCCCCCCCGGGGGGGGGGTTTTTTTTTT"


def _graph(ref_end, alt_ends, k=15):
    g = ReadThreadingGraph(k, start_only_at_existing=False)
    g.add_sequence(COMMON_PREFIX + ref_end, 1, True, "ref")
    for i, a in enumerate(alt_ends):
        g.add_sequence(COMMON_PREFIX + a, 1, False, f"alt{i}")
    g.build()
    return g


def test_forked_dangling_ends_recover_all():
    ref_end = b"GCTAGCTAATCG"
    alt1 = b"ACTAGCTAATCG"
    alt2 = b"ACTAGATAATCG"
    g = _graph(ref_end, [alt1, alt2])
    # the two alt reads share a fork: 3 sinks before recovery
    assert len(g.sinks()) == 3
    recovered = g.recover_dangling_ends(min_dangling_branch_length=4,
                                        min_matching_bases=1,
                                        recover_all=True)
    assert recovered >= 2
    g.remove_paths_not_connected_to_ref()
    haps = sorted(g._seq_of(p) for _, p in find_best_haplotypes(g, 16))
    expected = sorted([COMMON_PREFIX + ref_end, COMMON_PREFIX + alt1,
                       COMMON_PREFIX + alt2])
    assert haps == expected


def test_degenerate_fork_with_empty_suffix_match_does_not_merge():
    ref_end = b"GCTAGCTAATCGTTAAGCTTTAAC"
    alt1 = b"GCTAGCTAAGGCG"        # two mismatches vs the reference
    alt2 = b"GCTAGCTAAGCCGATGGCT"
    g = _graph(ref_end, [alt2, alt1])
    assert len(g.sinks()) == 3
    g.recover_dangling_ends(min_dangling_branch_length=2,
                            min_matching_bases=1, recover_all=False)
    g.remove_paths_not_connected_to_ref()
    haps = [g._seq_of(p) for _, p in find_best_haplotypes(g, 16)]
    # the alt2 fork's suffix match against the reference is empty: it must
    # not contribute a haplotype ending in its unmergeable bases
    assert not any(h.endswith(b"GCCGATGGCT") for h in haps)
