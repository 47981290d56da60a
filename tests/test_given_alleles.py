"""Forced-allele (--features-vcf) tests: haplotype injection semantics
(assembly_based_caller_utils.rs:376-556) and end-to-end force-calling of a
variant in an otherwise-inactive region
(haplotype_caller_engine.rs:1166-1177)."""
import os

import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import AssembledHaplotype
from lorikeet_tpu.calling.given_alleles import (
    add_given_haplotypes, insert_allele,
)
from lorikeet_tpu.models.variants import Allele, VariantContext

DATA = "/root/reference/tests/data"


def _vc(start, ref, alt):
    alleles = [Allele(ref, True), Allele(alt, False)]
    return VariantContext(0, start, start + len(ref) - 1, alleles)


def _window(n=60, seed=5):
    rng = np.random.default_rng(seed)
    return np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)]


def test_insert_allele_snp_and_deletion():
    window = _window()
    ref_hap = AssembledHaplotype(window.tobytes(), [("M", len(window))],
                                 0.0, True, 0)
    alt_base = b"A" if window[20] != ord("A") else b"G"
    snp = insert_allele(ref_hap, window, 100, 120, bytes(window[20:21]),
                        alt_base)
    assert snp is not None and snp.bases[20:21] == alt_base
    assert len(snp.bases) == len(window)

    dele = insert_allele(ref_hap, window, 100, 130, bytes(window[30:34]),
                         bytes(window[30:31]))
    assert dele is not None and len(dele.bases) == len(window) - 3


def test_add_given_haplotypes_injects_and_dedupes():
    window = _window()
    ref_hap = AssembledHaplotype(window.tobytes(), [("M", len(window))],
                                 0.0, True, 0)
    haplotypes = [ref_hap]
    hap_events = [{}]
    alt = b"A" if window[25] != ord("A") else b"G"
    given = [_vc(125, bytes(window[25:26]), alt)]
    added = add_given_haplotypes(haplotypes, hap_events, window, 100, given)
    assert added == 1 and len(haplotypes) == 2
    # the injected haplotype's event map contains exactly the given SNP
    ev = hap_events[1]
    assert list(ev) == [125]
    assert ev[125].alternate_alleles[0].bases == alt
    # re-adding the same allele is a no-op (already present in event space)
    added2 = add_given_haplotypes(haplotypes, hap_events, window, 100, given)
    assert added2 == 0 and len(haplotypes) == 2


def test_skips_haplotypes_with_overlapping_events():
    window = _window()
    ref_hap = AssembledHaplotype(window.tobytes(), [("M", len(window))],
                                 0.0, True, 0)
    # an assembled alt haplotype already carrying a different SNP at the locus
    alt1 = b"C" if window[25] not in (ord("C"),) else b"T"
    hap2 = insert_allele(ref_hap, window, 100, 125, bytes(window[25:26]), alt1)
    haplotypes = [ref_hap, hap2]
    hap_events = [{}, {125: _vc(125, bytes(window[25:26]), alt1)}]
    remaining = bytes(set(b"ACGT") - {window[25], alt1[0]})
    given = [_vc(125, bytes(window[25:26]), remaining[:1])]
    added = add_given_haplotypes(haplotypes, hap_events, window, 100, given)
    # injected only into the ref haplotype (hap2's event overlaps the locus)
    assert added == 1
    assert haplotypes[2].bases[25:26] == remaining[:1]


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
def test_features_vcf_forces_call_in_inactive_region(tmp_path):
    """With the active-probability threshold at 0.99 nothing is called;
    supplying the variant via --features-vcf forces the region active,
    injects the haplotype, and the supported allele is genotyped."""
    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.io.vcf import read_vcf, write_vcf
    from lorikeet_tpu.processing import run_call
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    alt = b"A" if ref[400] != ord("A") else b"G"
    truth = Variant(400, bytes(ref[400:401]), alt)
    recs = simulate_reads(ref, [truth], coverage=30, seed=7,
                          allele_fraction=0.5, error_rate=0.001, tid=tid)
    bam = str(tmp_path / "s.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)), header_text=None)

    feature = VariantContext(tid, 400, 400,
                             [Allele(bytes(ref[400:401]), True),
                              Allele(alt, False)])
    fvcf = str(tmp_path / "features.vcf")
    write_vcf(fvcf, [feature], fr.names,
              [fr.length(n) for n in fr.names], [])

    base = dict(use_pallas=False, active_prob_threshold=0.99)
    vcf1 = run_call(os.path.join(DATA, "7seqs.fna"), [bam],
                    str(tmp_path / "out1"), CallerConfig(**base))
    assert len(read_vcf(vcf1)[0]) == 0

    vcf2 = run_call(os.path.join(DATA, "7seqs.fna"), [bam],
                    str(tmp_path / "out2"),
                    CallerConfig(**base, features_vcf=fvcf))
    contexts, contigs, _ = read_vcf(vcf2)
    hits = [vc for vc in contexts if contigs[vc.tid] == contig
            and vc.start == 400]
    assert hits, "forced allele was not called"
    assert hits[0].alternate_alleles[0].bases == alt
