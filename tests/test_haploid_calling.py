"""End-to-end `call` at --ploidy 1 (haploid — the natural model for
bacterial strains).  Exercises the (ploidy, n_alleles) genotype machinery
off the diploid default: GT must be a single allele, PL length =
C(1+A-1, A-1) = A, and hom-alt QUAL/AD behave.
(genotype_likelihood_calculators.rs cache is keyed by (ploidy, alleles);
cli.rs:1934 exposes --ploidy.)"""
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.processing import run_call
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


@pytest.fixture(scope="module")
def haploid_vcf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hap1")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = [Variant(250, bytes(ref[250:251]),
                        b"T" if ref[250] != ord("T") else b"C"),
                Variant(600, bytes(ref[600:603]), bytes(ref[600:601]))]  # del
    recs = simulate_reads(ref, variants, coverage=30, seed=7,
                          allele_fraction=1.0, tid=tid)
    bam = str(tmp / "s1.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names],
              sorted(recs, key=lambda r: (r.tid, r.pos)))
    cfg = CallerConfig(use_pallas=False, ploidy=1)
    vcf = run_call(os.path.join(DATA, "7seqs.fna"), [bam],
                   str(tmp / "out"), cfg)
    return vcf, variants


def test_haploid_genotypes(haploid_vcf):
    vcf, variants = haploid_vcf
    body = [l.rstrip("\n").split("\t")
            for l in open(vcf) if not l.startswith("#")]
    positions = {int(r[1]) - 1: r for r in body}
    for v in variants:
        assert v.pos in positions, f"missing haploid call at {v.pos}"
        r = positions[v.pos]
        fmt = dict(zip(r[8].split(":"), r[9].split(":")))
        assert fmt["GT"] == "1"                      # single-allele GT
        n_alleles = 1 + len(r[4].split(","))
        assert len(fmt["PL"].split(",")) == n_alleles  # haploid PL length
        ad = [int(x) for x in fmt["AD"].split(",")]
        assert ad[1] > 0 and ad[0] == 0              # pure alt support
        assert float(r[5]) > 50                      # confident QUAL
