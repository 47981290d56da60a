"""Multi-sample calling + strain resolution end-to-end.

Two samples carrying different variant sets on the same genome: per-sample
genotypes must differ, ANI must drop off-diagonal, and genotype mode must
resolve two distinct strains via read linkage (the flagship Lorikeet
behaviour: haplotype_clustering_engine.rs + linkage_engine.rs +
abundance_calculator_engine.rs)."""
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.processing import start_engine
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")


@pytest.fixture(scope="module")
def two_sample_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ms")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome1~random_sequence_length_11000"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)

    def alt_at(pos):
        return b"C" if ref[pos] != ord("C") else b"T"

    # strain A: variants at 2000/2100 (linked); strain B: at 6000/6150
    strain_a = [Variant(2000, bytes(ref[2000:2001]), alt_at(2000)),
                Variant(2100, bytes(ref[2100:2101]), alt_at(2100))]
    strain_b = [Variant(6000, bytes(ref[6000:6001]), alt_at(6000)),
                Variant(6150, bytes(ref[6150:6151]), alt_at(6150))]

    lengths = [fr.length(n) for n in fr.names]
    recs1 = simulate_reads(ref, strain_a, coverage=30, seed=21,
                           allele_fraction=1.0, tid=tid, fragment_mean=350)
    bam1 = str(tmp / "s1.bam")
    write_bam(bam1, fr.names, lengths, recs1,
              header_text="@HD\tVN:1.6\n@RG\tID:1\tSM:sampleA\n")
    recs2 = simulate_reads(ref, strain_b, coverage=30, seed=22,
                           allele_fraction=1.0, tid=tid, fragment_mean=350)
    bam2 = str(tmp / "s2.bam")
    write_bam(bam2, fr.names, lengths, recs2,
              header_text="@HD\tVN:1.6\n@RG\tID:1\tSM:sampleB\n")

    cfg = CallerConfig(use_pallas=False)
    out = start_engine("genotype", [os.path.join(DATA, "7seqs.fna")],
                       [bam1, bam2], str(tmp / "out"), cfg)
    return out["genome1"], strain_a, strain_b


def test_both_samples_called_with_correct_genotypes(two_sample_run):
    out, strain_a, strain_b = two_sample_run
    body = [l.rstrip("\n").split("\t")
            for l in open(out["vcf"]) if not l.startswith("#")]
    positions = {int(r[1]) - 1: r for r in body}
    for v in strain_a + strain_b:
        assert v.pos in positions, f"missing call at {v.pos}"
    # sampleA hom-alt at strain A sites, hom-ref at strain B sites
    for v in strain_a:
        r = positions[v.pos]
        assert r[9].startswith("1/1") and r[10].startswith("0/0")
    for v in strain_b:
        r = positions[v.pos]
        assert r[9].startswith("0/0") and r[10].startswith("1/1")


def test_ani_discriminates_samples(two_sample_run):
    out, *_ = two_sample_run
    from lorikeet_tpu.strain.ani import read_ani_table
    names, mat = read_ani_table(out["ani"]["consensus_ani"])
    assert len(names) == 2 and mat.shape == (2, 2)
    # the cross-sample cell accumulates both strains' differing sites, and
    # each diagonal compares that sample against the reference genome itself
    # (ani_calculator.rs:293-327) — all strictly below 1 here (the diagonal
    # denominator is that sample's own passing-base count, so no ordering
    # between diagonal and off-diagonal cells is implied)
    assert mat[0, 1] == mat[1, 0]
    assert 0.99 < mat[0, 1] < 1.0
    assert 0.99 < mat[0, 0] < 1.0
    assert 0.99 < mat[1, 1] < 1.0


def test_two_strains_resolved(two_sample_run):
    out, *_ = two_sample_run
    assert out["n_strains"] == 2
    # coverage table: each strain present in exactly one sample
    lines = open(out["strain_coverages"]).read().splitlines()
    vals = np.array([[float(x) for x in l.split("\t")[1:]]
                     for l in lines[1:]])
    assert vals.shape == (2, 2)
    # per strain, one sample dominates
    for row in vals:
        assert row.max() > 0 and row.min() <= row.max() / 2
    assert len(out["strain_fastas"]) == 2


def test_strain_fastas_carry_their_variants(two_sample_run):
    """Each strain genome has ITS variants spliced in and the other
    strain's sites left at reference (reference_writer.rs:31
    generate_strains splice semantics)."""
    out, strain_a, strain_b = two_sample_run
    contig = "genome1~random_sequence_length_11000"
    # map strain index -> dominant sample via the coverage table
    lines = open(out["strain_coverages"]).read().splitlines()
    vals = np.array([[float(x) for x in l.split("\t")[1:]]
                     for l in lines[1:]])
    strain_of_sample_a = int(np.argmax(vals[:, 0]))
    expected = {strain_of_sample_a: (strain_a, strain_b),
                1 - strain_of_sample_a: (strain_b, strain_a)}
    for s_idx, (own, other) in expected.items():
        fr = FastaReader(out["strain_fastas"][s_idx])
        seq = fr.fetch(contig)
        for v in own:
            assert seq[v.pos] == v.alt[0], f"strain {s_idx} missing {v.pos}"
        for v in other:
            assert seq[v.pos] == v.ref[0], f"strain {s_idx} has foreign {v.pos}"
