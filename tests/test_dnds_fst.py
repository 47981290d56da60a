"""dN/dS and Fst tests on real reference data (single_genome.fna + its real
prodigal GFF) with synthetic variants of known synonymy."""
import os

import numpy as np
import pytest

from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext
from lorikeet_tpu.strain.dnds import (
    GffGene, codon_table, find_mutations, get_codons, read_gff,
)
from lorikeet_tpu.strain.fst import calculate_fst, hudson_fst_per_variant

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")


def test_codon_table():
    aminos, ns_sites = codon_table()
    assert aminos[b"ATG"] == "M"
    assert aminos[b"TAA"] == "*"
    assert aminos[b"GCT"] == aminos[b"GCC"] == "A"   # 4-fold degenerate
    # TGG (Trp): every single-base change is nonsynonymous -> N = 3
    assert abs(ns_sites[b"TGG"] - 3.0) < 1e-9
    # third position of GCN is fully synonymous -> N = 2
    assert abs(ns_sites[b"GCT"] - 2.0) < 1e-9


def test_read_real_prodigal_gff():
    genes = read_gff(os.path.join(DATA, "single_genome.gff"))
    assert genes
    g = genes[0]
    assert g.seqname == "genome5~seq2"
    assert (g.start, g.end, g.strand) == (870, 998, "+")


def _vc(pos, ref_b, alt_b, ad):
    alleles = [Allele(ref_b, True), Allele(alt_b, False)]
    g = Genotype(0, 2, None, ad=np.array(ad), dp=int(sum(ad)))
    vc = VariantContext(0, pos, pos, alleles, [g])
    vc.attributes["QD"] = 30.0
    return vc


def test_find_mutations_synonymous_vs_nonsynonymous():
    # gene: ATG GCT TGG TAA  (M A W *)
    seq = np.frombuffer(b"ATGGCTTGGTAA", np.uint8)
    gene = GffGene("c", 1, 12, "+", 0, "g1")
    # synonymous: GCT->GCC (pos 5, 0-based: codon 1 position 2)
    syn = _vc(5, b"T", b"C", [0, 20])
    snps, fs, dnds = find_mutations(gene, [syn], seq, 1)
    assert snps[0] == 1 and fs[0] == 0
    assert dnds[0] == 0.0       # only synonymous changes -> dN/dS 0
    # nonsynonymous: TGG->TGT (codon 2 pos 2: W->C)
    non = _vc(8, b"G", b"T", [0, 20])
    snps, fs, dnds = find_mutations(gene, [non], seq, 1)
    assert snps[0] == 1
    assert dnds[0] > 0.0
    # frameshift: deletion allele
    fs_vc = _vc(4, b"CTT", b"C", [0, 20])
    snps, fs, dnds = find_mutations(gene, [fs_vc], seq, 1)
    assert fs[0] == 1


def test_hudson_fst_extremes():
    # fixed opposite alleles: Fst ~ 1
    ac1 = np.array([[20.0, 0.0]] * 5)
    ac2 = np.array([[0.0, 20.0]] * 5)
    num, den = hudson_fst_per_variant(ac1, ac2)
    fst = num / den
    assert np.all(fst > 0.9)
    # identical frequencies: Fst ~ 0
    num, den = hudson_fst_per_variant(ac1, ac1)
    fst = np.nan_to_num(num / den)
    assert np.all(fst <= 0.1)


def test_fst_matrix():
    contexts = []
    for pos in range(5):
        alleles = [Allele(b"A", True), Allele(b"T", False)]
        g1 = Genotype(0, 2, None, ad=np.array([20, 0]), dp=20)
        g2 = Genotype(1, 2, None, ad=np.array([0, 20]), dp=20)
        vc = VariantContext(0, pos * 100, pos * 100, alleles, [g1, g2])
        vc.attributes["QD"] = 30.0
        contexts.append(vc)
    mat = calculate_fst(contexts, 2)
    assert mat[0, 1] == mat[1, 0]
    assert mat[0, 1] > 0.9
    assert mat[0, 0] == 0.0
