"""Tests for the assembly/trimmer/filter knob batch.

Reference behaviors covered:
- tandem-repeat decomposition (variant_context_utils.rs:151-266);
- density-keyed additional kmer sizes (assembly_region.rs:120-151);
- ref non-unique-kmer gate (--allow-non-unique-kmers-in-ref);
- dangling-end min-matching-bases gate (read_threading_graph.rs:975-1000);
- soft-clip low-quality ends (assembly_based_caller_utils.rs:111);
- FlagFilter gates (mod.rs:25-37, utils.rs:606-608 defaults);
- prodigal GFF cache discovery (lorikeet_engine.rs:1307-1330);
- CLI plumbing of the new flags.
"""
import numpy as np
import pytest

from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.utils.repeats import (
    find_number_of_repetitions, find_repeated_substring,
    get_num_tandem_repeat_units, vc_tandem_repeat_units,
)


def _rec(pos, cigar, seq, qual=None, flag=0, **kw):
    seq_a = np.frombuffer(seq.encode(), np.uint8).copy()
    qual_a = (np.full(len(seq_a), 30, np.uint8) if qual is None
              else np.asarray(qual, np.uint8))
    return BamRecord(name=kw.pop("name", "r"), flag=flag, tid=0, pos=pos,
                     mapq=60, cigar=cigar, seq=seq_a, qual=qual_a, **kw)


# ---------------------------------------------------------------- repeats

def test_find_repeated_substring():
    assert find_repeated_substring(b"ACTACT") == 3
    assert find_repeated_substring(b"ATATAT") == 2
    assert find_repeated_substring(b"CCCC") == 1
    # not decomposable: the trivial full-length unit (GATK semantics)
    assert find_repeated_substring(b"ACTACA") == 6


def test_find_number_of_repetitions():
    # doc examples from variant_context_utils.rs:232-238
    assert find_number_of_repetitions(b"AT", b"GATAT", True) == 0
    assert find_number_of_repetitions(b"AT", b"GATAT", False) == 2
    assert find_number_of_repetitions(b"A", b"ATATG", True) == 1
    assert find_number_of_repetitions(b"AT", b"ATATG", True) == 2
    assert find_number_of_repetitions(b"CCC", b"CCCCCCCC", True) == 2
    assert find_number_of_repetitions(b"CCC", b"CCCCCCCC", False) == 2


def test_get_num_tandem_repeat_units_insertion():
    # ref - / alt ATAT insertion just before ATATAT context:
    # (AT)3 -> (AT)5 described as unit AT
    counts, unit = get_num_tandem_repeat_units(b"", b"ATAT", b"ATATATGC")
    assert unit == b"AT"
    assert counts == [3, 5]


def test_vc_tandem_repeat_units_from_vc():
    from lorikeet_tpu.models.variants import Allele, VariantContext
    # window: pos 10 = G, insertion GAT at pos 10, following context ATATATCC
    window = b"AAAAAAAAAAGATATATCCGGG"
    vc = VariantContext(tid=0, start=10, end=10,
                        alleles=[Allele(b"G", True), Allele(b"GAT")])
    result = vc_tandem_repeat_units(vc, window, 0)
    assert result is not None
    lengths, unit = result
    assert unit == b"AT"
    assert lengths == [3, 4]


def test_vc_tandem_repeat_units_snp_is_none():
    from lorikeet_tpu.models.variants import Allele, VariantContext
    vc = VariantContext(tid=0, start=5, end=5,
                        alleles=[Allele(b"A", True), Allele(b"C")])
    assert vc_tandem_repeat_units(vc, b"AAAAAAAAAA", 0) is None


# ----------------------------------------------------- additional kmers

def test_compute_additional_kmer_sizes_density_tiers():
    from lorikeet_tpu.assembly.graph import compute_additional_kmer_sizes
    assert compute_additional_kmer_sizes(0.1, [21, 33]) == []
    # low tier: only the middle candidate (35 -> bumped past 33 by +3s)
    low = compute_additional_kmer_sizes(0.25, [21, 33])
    assert low == [38]
    # high tier: all three candidates, each cleared +-5 of existing sizes
    high = compute_additional_kmer_sizes(0.7, [21, 33])
    assert len(high) == 3
    all_sizes = [21, 33] + high
    for i, k in enumerate(high):
        others = [s for s in all_sizes if s is not k]
        assert all(abs(k - s) >= 5 or k == s for s in others)


def test_ref_non_unique_kmer_gate():
    from lorikeet_tpu.assembly.graph import _ref_has_non_unique_kmers
    assert _ref_has_non_unique_kmers(b"ACGTACGTA", 4)   # ACGT repeats
    assert not _ref_has_non_unique_kmers(b"ACGTTGCAA", 4)


# ------------------------------------------------------ dangling recovery

def _tail_graph(min_matching_bases):
    """Reads support the ref prefix then diverge and rejoin: the dangling
    tail's junction suffix-match length gates the merge."""
    from lorikeet_tpu.assembly.graph import ReadThreadingGraph
    ref = b"ACGTTGCAATCCGGATTACAGGCATCGTCAAT"
    # read carries a SNP then matches the ref tail exactly
    alt = bytearray(ref)
    alt[20] = ord("T")  # G->T
    g = ReadThreadingGraph(11)
    g.add_sequence(ref, 1, True, "ref")
    g.add_sequence(bytes(alt[:29]), 3, False, "read")
    g.build()
    g.flush_sample()
    n_edges_before = sum(len(o) for o in g.out_edges)
    g.recover_dangling_ends(min_dangling_branch_length=1,
                            min_matching_bases=min_matching_bases)
    return n_edges_before, sum(len(o) for o in g.out_edges)


def test_dangling_tail_merges_in_legacy_mode():
    before, after = _tail_graph(-1)
    assert after == before + 1


def test_dangling_tail_blocked_by_min_matching():
    before, after = _tail_graph(10 ** 6)
    assert after == before


# ------------------------------------------------------- soft clip ends

def test_soft_clip_low_qual_ends_keeps_bases():
    from lorikeet_tpu.calling.clipping import soft_clip_low_qual_ends
    qual = [2, 2, 30, 30, 30, 30, 2, 2]
    r = _rec(100, [("M", 8)], "ACGTACGT", qual=qual)
    out = soft_clip_low_qual_ends(r, 9)
    assert out.cigar == [("S", 2), ("M", 4), ("S", 2)]
    assert out.seq.tobytes() == b"ACGTACGT"      # bases retained
    assert out.pos == 102                         # first aligned base


def test_soft_clip_low_qual_ends_noop_when_clean():
    from lorikeet_tpu.calling.clipping import soft_clip_low_qual_ends
    r = _rec(100, [("M", 6)], "ACGTAC")
    assert soft_clip_low_qual_ends(r, 9) is r


# ----------------------------------------------------------- flag filter

def test_flag_filter_defaults_keep_supplementary():
    from lorikeet_tpu.io.filter import FlagFilter
    ff = FlagFilter()
    supp = _rec(0, [("M", 40)], "A" * 40, flag=0x800)
    sec = _rec(0, [("M", 40)], "A" * 40, flag=0x100)
    improper = _rec(0, [("M", 40)], "A" * 40, flag=0x1)  # paired, not proper
    assert ff.passes(supp)
    assert not ff.passes(sec)
    assert not ff.passes(improper)
    assert FlagFilter(include_improper_pairs=True).passes(improper)
    assert not FlagFilter(include_supplementary=False).passes(supp)


def test_read_filter_supplementary_follows_flag_filter():
    from lorikeet_tpu.io.filter import FlagFilter
    from lorikeet_tpu.processing import _read_passes_filters
    supp = _rec(0, [("M", 40)], "ACGT" * 10, flag=0x800)
    assert _read_passes_filters(supp, 20, flag_filter=FlagFilter())
    assert not _read_passes_filters(
        supp, 20, flag_filter=FlagFilter(include_supplementary=False))
    # without a filter the legacy conservative behavior holds
    assert not _read_passes_filters(supp, 20)


# ------------------------------------------------------------ gff cache

def test_check_for_gff_uses_cached_file(tmp_path):
    from lorikeet_tpu.strain.dnds import check_for_gff
    gff = tmp_path / "genes.gff"
    gff.write_text("##gff-version 3\n")
    assert check_for_gff("ref.fna", str(tmp_path)) == str(gff)


def test_check_for_gff_ambiguous_cache_is_none(tmp_path):
    from lorikeet_tpu.strain.dnds import check_for_gff
    (tmp_path / "a.gff").write_text("")
    (tmp_path / "b.gff").write_text("")
    assert check_for_gff("ref.fna", str(tmp_path)) is None


# ------------------------------------------------------------------ CLI

def test_cli_plumbs_new_knobs():
    from lorikeet_tpu.cli import _caller_config, build_parser
    p = build_parser()
    args = p.parse_args([
        "call", "-r", "x.fna", "-b", "x.bam",
        "--min-dangling-branch-length", "4",
        "--min-matching-bases-to-dangling-end-recovery", "2",
        "--recover-all-dangling-branches",
        "--dont-increase-kmer-sizes-for-cycles",
        "--disable-automatic-kmer-adjustment",
        "--allow-non-unique-kmers-in-ref",
        "--num-pruning-samples", "3",
        "--max-allowed-path-for-read-threading-assembler", "64",
        "--snp-padding-for-genotyping", "11",
        "--indel-padding-for-genotyping", "99",
        "--str-padding-for-genotyping", "44",
        "--max-prob-propagation-distance", "33",
        "--min-contig-size", "500",
        "--dont-use-soft-clipped-bases",
        "--soft-clip-low-quality-ends",
        "--allow-improper-pairs", "--exclude-supplementary",
        "--do-not-call-svs",
        # parity-accepted flags must parse
        "--high-memory", "--error-correct-reads", "--trim-min", "0.1",
    ])
    cfg = _caller_config(args)
    assert cfg.min_dangling_branch_length == 4
    assert cfg.min_matching_bases_to_dangling_end_recovery == 2
    assert cfg.recover_all_dangling_branches
    assert cfg.dont_increase_kmer_sizes_for_cycles
    assert cfg.disable_automatic_kmer_adjustment
    assert cfg.allow_non_unique_kmers_in_ref
    assert cfg.num_pruning_samples == 3
    assert cfg.max_allowed_path_for_read_threading_assembler == 64
    assert cfg.snp_padding_for_genotyping == 11
    assert cfg.indel_padding_for_genotyping == 99
    assert cfg.str_padding_for_genotyping == 44
    assert cfg.max_prob_propagation_distance == 33
    assert cfg.min_contig_size == 500
    assert cfg.dont_use_soft_clipped_bases
    assert cfg.soft_clip_low_quality_ends
    assert cfg.do_not_call_svs
    assert cfg.flag_filter.include_improper_pairs
    assert not cfg.flag_filter.include_supplementary


def test_cli_do_not_recover_dangling_branches():
    from lorikeet_tpu.cli import _caller_config, build_parser
    p = build_parser()
    args = p.parse_args(["call", "-r", "x.fna", "-b", "x.bam",
                         "--do-not-recover-dangling-branches"])
    cfg = _caller_config(args)
    assert not cfg.recover_dangling_branches


def test_profile_presets_pin_assembly_flags():
    from lorikeet_tpu.cli import _caller_config, build_parser
    p = build_parser()
    args = p.parse_args(["call", "-r", "x.fna", "-b", "x.bam",
                         "--profile", "sensitive",
                         "--allow-non-unique-kmers-in-ref",
                         "--recover-all-dangling-branches"])
    cfg = _caller_config(args)
    # presets pin these off (haplotype_caller_engine.rs:255-298)
    assert not cfg.allow_non_unique_kmers_in_ref
    assert not cfg.recover_all_dangling_branches
    assert cfg.prune_factor == 0
