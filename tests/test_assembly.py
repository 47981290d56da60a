"""Assembly engine tests, modeled on the reference's assembler suite
(/root/reference/tests/read_threading_assembler_unit_tests.rs:45-260:
assemble reference windows with synthetic reads and assert the recovered
haplotypes are exactly ref/SNP/indel variants).  The reference used LFS-
hosted human FASTA windows; here real 7seqs contigs play that role.
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph, assemble_region, \
    find_best_haplotypes
from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.testkit.simulate import Variant, apply_variants

DATA = "/root/reference/tests/data"
BASES = np.frombuffer(b"ACGT", np.uint8)


def _window(length=300, seed=0):
    if os.path.isdir(DATA):
        fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
        ref = fr.fetch("genome3~random_sequence_length_11001", 2000, 2000 + length)
    else:
        ref = BASES[np.random.default_rng(seed).integers(0, 4, length)]
    return ref


def _reads_from(seq: np.ndarray, read_len=80, stride=7, qual=30):
    recs = []
    for k, s in enumerate(range(0, len(seq) - read_len + 1, stride)):
        bases = np.asarray(seq[s:s + read_len], np.uint8).copy()
        recs.append(BamRecord(
            name=f"r{k}", flag=0, tid=0, pos=s, mapq=60,
            cigar=[("M", read_len)], seq=bases,
            qual=np.full(read_len, qual, np.uint8)))
    return recs


def _haplotype_set(ref, reads):
    haps = assemble_region(ref, {0: reads})
    return {h.bases for h in haps}, haps


def test_assemble_ref_only():
    ref = _window()
    haps, _ = _haplotype_set(ref, _reads_from(ref))
    assert haps == {ref.tobytes()}


def test_assemble_ref_plus_snp():
    ref = _window()
    alt_base = b"A" if ref[150] != ord("A") else b"T"
    hap, _ = apply_variants(ref, [Variant(150, bytes(ref[150:151]), alt_base)])
    reads = _reads_from(ref) + _reads_from(hap)
    haps, out = _haplotype_set(ref, reads)
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps
    # the SNP haplotype's cigar is a pure match
    snp_h = next(h for h in out if h.bases == hap.tobytes())
    assert snp_h.cigar == [("M", len(ref))]


def test_assemble_ref_plus_deletion():
    ref = _window()
    del_len = 10
    v = Variant(140, bytes(ref[140:141 + del_len]), bytes(ref[140:141]))
    hap, _ = apply_variants(ref, [v])
    reads = _reads_from(ref) + _reads_from(hap)
    haps, out = _haplotype_set(ref, reads)
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps
    del_h = next(h for h in out if h.bases == hap.tobytes())
    assert ("D", del_len) in del_h.cigar


def test_assemble_ref_plus_insertion():
    ref = _window()
    ins = b"TTAGGCA"
    v = Variant(160, bytes(ref[160:161]), bytes(ref[160:161]) + ins)
    hap, _ = apply_variants(ref, [v])
    reads = _reads_from(ref) + _reads_from(hap)
    haps, out = _haplotype_set(ref, reads)
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps
    ins_h = next(h for h in out if h.bases == hap.tobytes())
    assert ("I", len(ins)) in ins_h.cigar


def test_assemble_two_snps_phased_haplotypes():
    ref = _window()
    a1 = b"G" if ref[100] != ord("G") else b"C"
    a2 = b"G" if ref[200] != ord("G") else b"C"
    hap, _ = apply_variants(ref, [Variant(100, bytes(ref[100:101]), a1),
                                  Variant(200, bytes(ref[200:201]), a2)])
    reads = _reads_from(ref) + _reads_from(hap)
    haps, _ = _haplotype_set(ref, reads)
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps


def test_low_support_haplotype_pruned():
    ref = _window()
    alt_base = b"A" if ref[150] != ord("A") else b"T"
    hap, _ = apply_variants(ref, [Variant(150, bytes(ref[150:151]), alt_base)])
    # deep ref coverage, a single error-like alt read -> pruned
    reads = _reads_from(ref, stride=3) + _reads_from(hap, stride=300)
    haps, _ = _haplotype_set(ref, reads)
    assert hap.tobytes() not in haps


def test_kbest_scores_ordered():
    ref = _window()
    alt_base = b"A" if ref[150] != ord("A") else b"T"
    hap, _ = apply_variants(ref, [Variant(150, bytes(ref[150:151]), alt_base)])
    g = ReadThreadingGraph(21)
    g.add_sequence(ref.tobytes(), 1, True, "ref")
    for rec in _reads_from(ref, stride=4) + _reads_from(hap, stride=12):
        g.add_read(rec, 10)
    g.build()
    results = find_best_haplotypes(g, 16)
    scores = [s for s, _ in results]
    assert scores == sorted(scores, reverse=True)  # best (least negative) first
    # the majority (ref) haplotype must score best
    assert g._seq_of(results[0][1]) == ref.tobytes()


def test_kmer_retry_schedule_matches_reference():
    """Expansion sizes follow read_threading_assembler.rs:419-450: start at
    max(kmer_sizes)+13 bumped to odd, then flat +13 steps, at most 6."""
    from lorikeet_tpu.assembly.graph import (
        KMER_SIZE_ITERATION_INCREASE, MAX_KMER_ITERATIONS_TO_ATTEMPT,
    )
    assert KMER_SIZE_ITERATION_INCREASE == 13
    assert MAX_KMER_ITERATIONS_TO_ATTEMPT == 6
    base = 25
    k = base + KMER_SIZE_ITERATION_INCREASE
    if k % 2 == 0:
        k += 1
    sizes = [k]
    for _ in range(MAX_KMER_ITERATIONS_TO_ATTEMPT - 1):
        sizes.append(sizes[-1] + KMER_SIZE_ITERATION_INCREASE)
    assert sizes == [39, 52, 65, 78, 91, 104]


def test_pruning_multiplicity_seeded_by_creation():
    """A single-sample edge under num_pruning_samples=2 floors at its
    creation multiplicity, not 0 (multi_sample_edge.rs:57-96)."""
    from lorikeet_tpu.assembly.graph import Edge
    e = Edge(False, 2, initial=1)
    for _ in range(4):
        e.inc(1)
    e.flush_sample(2)
    assert e.pruning_multiplicity(2) == 1   # {1 (seed), 5} -> min = 1
    # a second sample that never touches the edge flushes a 0
    e.flush_sample(2)
    assert e.pruning_multiplicity(2) == 1   # {1, 5, 0} -> keep {5, 1}
