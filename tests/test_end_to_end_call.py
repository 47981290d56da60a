"""End-to-end `call` validation: simulate reads with known variants from the
real 7seqs reference, write a BAM, run the full pipeline, and check the VCF
recovers the injected truth.  (Replaces the reference's VCF-equality configs,
whose BAM fixtures are unfetched git-lfs pointers.)"""
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.io.vcf import read_vcf
from lorikeet_tpu.processing import run_call
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")


@pytest.fixture(scope="module")
def called_vcf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"          # 1000 bp
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = [
        Variant(200, bytes(ref[200:201]),
                b"A" if ref[200] != ord("A") else b"G"),              # SNP
        Variant(500, bytes(ref[500:505]), bytes(ref[500:501])),       # 4bp del
        Variant(800, bytes(ref[800:801]), bytes(ref[800:801]) + b"CTA"),  # ins
    ]
    recs = simulate_reads(ref, variants, coverage=35, seed=11,
                          allele_fraction=0.5, error_rate=0.001, tid=tid)
    bam = str(tmp / "sample1.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)), header_text=None)
    # restrict to this contig via reference with one contig? run across all:
    out = str(tmp / "out")
    cfg = CallerConfig(use_pallas=False)
    vcf = run_call(os.path.join(DATA, "7seqs.fna"), [bam], out, cfg)
    return vcf, variants, contig


def test_vcf_written(called_vcf):
    vcf, variants, contig = called_vcf
    assert os.path.exists(vcf)
    contexts, contigs, samples = read_vcf(vcf)
    assert samples == ["sample0"]
    assert len(contexts) >= 3


def test_injected_variants_recovered(called_vcf):
    vcf, variants, contig = called_vcf
    contexts, contigs, _ = read_vcf(vcf)
    tid = contigs.index(contig)
    by_pos = {(v.tid, v.start): v for v in contexts if v.tid == tid}
    for truth in variants:
        key = (tid, truth.pos)
        assert key in by_pos, f"variant at {truth.pos} not called: {sorted(p for t,p in by_pos)}"
        vc = by_pos[key]
        assert vc.reference.bases == truth.ref, (vc.reference.bases, truth.ref)
        assert any(a.bases == truth.alt for a in vc.alternate_alleles), \
            (truth.alt, [a.bases for a in vc.alternate_alleles])


def test_no_spurious_calls(called_vcf):
    vcf, variants, contig = called_vcf
    contexts, contigs, _ = read_vcf(vcf)
    tid = contigs.index(contig)
    truth_pos = {v.pos for v in variants}
    false_pos = [v for v in contexts
                 if v.tid == tid and v.start not in truth_pos]
    # allow at most 1 borderline artifact from simulated sequencing errors
    assert len(false_pos) <= 1, [(v.start, str(v.reference),
                                  [str(a) for a in v.alternate_alleles])
                                 for v in false_pos]
    # nothing on untouched contigs
    others = [v for v in contexts if v.tid != tid]
    assert not others


def test_genotypes_and_annotations(called_vcf):
    vcf, variants, contig = called_vcf
    contexts, contigs, _ = read_vcf(vcf)
    tid = contigs.index(contig)
    for vc in contexts:
        if vc.tid != tid or vc.start not in {v.pos for v in variants}:
            continue
        assert vc.phred_scaled_qual > 25.0
        assert vc.attributes.get("DP", 0) > 10
        assert "QD" in vc.attributes and "MQ" in vc.attributes
        g = vc.genotypes[0]
        assert g.dp > 10
        # ~50% allele fraction: het call expected
        assert len(set(str(a) for a in g.alleles)) == 2, [str(a) for a in g.alleles]
        assert g.ad is not None and g.ad.sum() > 0
