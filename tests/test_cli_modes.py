"""CLI-level tests for call / consensus / genotype / summarise modes."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.io.fasta import FastaReader
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")


@pytest.fixture(scope="module")
def sim_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    variants = [Variant(300, bytes(ref[300:301]),
                        b"C" if ref[300] != ord("C") else b"T"),
                Variant(700, bytes(ref[700:701]),
                        b"G" if ref[700] != ord("G") else b"A")]
    recs = simulate_reads(ref, variants, coverage=30, seed=5,
                          allele_fraction=1.0, tid=tid)
    bam = str(tmp / "s1.bam")
    write_bam(bam, fr.names, [fr.length(n) for n in fr.names], recs)
    return bam, variants, contig, str(tmp)


def _run_cli(args):
    proc = subprocess.run(
        [sys.executable, "-m", "lorikeet_tpu.cli"] + args,
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_call(sim_bam):
    bam, variants, contig, tmp = sim_bam
    out = _run_cli(["call", "-r", os.path.join(DATA, "7seqs.fna"),
                    "-b", bam, "-o", tmp + "/call_out", "--force-cpu"])
    # 7seqs.fna holds 7 '~'-named genomes -> one output dir per genome
    genomes = out["outputs"]["genomes"]
    assert len(genomes) == 6
    vcf = genomes["genome2"]["vcf"]
    assert os.path.exists(vcf)
    body = [l for l in open(vcf) if not l.startswith("#")]
    positions = {int(l.split("\t")[1]) - 1 for l in body}
    for v in variants:
        assert v.pos in positions
    # call mode writes per-genome ANI tables
    assert os.path.exists(genomes["genome2"]["ani"]["consensus_ani"])
    # other genomes have no reads -> empty VCFs
    assert not [l for l in open(genomes["genome1"]["vcf"])
                if not l.startswith("#")]


def test_cli_consensus(sim_bam):
    bam, variants, contig, tmp = sim_bam
    out = _run_cli(["consensus", "-r", os.path.join(DATA, "7seqs.fna"),
                    "-b", bam, "-o", tmp + "/cons_out", "--force-cpu"])
    cons = out["outputs"]["genomes"]["genome2"]["consensus"]
    assert len(cons) == 1 and os.path.exists(cons[0])
    # the consensus genome must contain the (hom) alt alleles
    fr = FastaReader(cons[0])
    seq = fr.fetch(contig)
    for v in variants:
        assert seq[v.pos] == v.alt[0], (chr(seq[v.pos]), chr(v.alt[0]))


def test_cli_genotype_and_summarise(sim_bam):
    bam, variants, contig, tmp = sim_bam
    out = _run_cli(["genotype", "-r", os.path.join(DATA, "7seqs.fna"),
                    "-b", bam, "-o", tmp + "/geno_out", "--force-cpu"])
    g2 = out["outputs"]["genomes"]["genome2"]
    assert os.path.exists(g2["strain_coverages"])
    vcf = g2["vcf"]
    out2 = _run_cli(["summarise", "-i", vcf, "-o", tmp + "/sum_out",
                     "--calculate-fst"])
    tables = list(out2["outputs"].values())[0]
    assert os.path.exists(tables["consensus_ani"])
    # summarise computes Hudson Fst from the VCF alone
    # (lorikeet_engine.rs:1294-1301)
    assert os.path.exists(tables["fst"])
    from lorikeet_tpu.strain.ani import read_ani_table
    with open(tables["consensus_ani"]) as fh:
        lines = fh.read().splitlines()
    # reference table format: ##source, ##sample lines, then the matrix
    # (ani_calculator.rs:354-405)
    assert lines[0].startswith("##source=lorikeet-v")
    assert lines[1].startswith("##sample=<ID=1")
    assert lines[2].startswith("SampleID")
    names, mat = read_ani_table(tables["consensus_ani"])
    assert len(names) == 1 and mat.shape == (1, 1)
    # the diagonal compares the sample against the reference genome itself
    # (ani_calculator.rs:293-327): hom-alt variants push self-ANI below 1
    assert 0.0 < mat[0, 0] < 1.0
    # qualification knobs gate sites (cli.rs:3560-3577 summarise args):
    # an impossible QD threshold disqualifies everything -> self-ANI 1.0
    out3 = _run_cli(["summarise", "-i", vcf, "-o", tmp + "/sum_strict",
                     "--qual-by-depth-filter", "1e9",
                     "--depth-per-sample-filter", "100000"])
    strict = list(out3["outputs"].values())[0]
    _, mat3 = read_ani_table(strict["consensus_ani"])
    assert mat3[0, 0] == 1.0


def test_cli_limiting_interval(sim_bam):
    """--limiting-interval restricts calling to [start, end)
    (interval_utils.rs:58 parse_limiting_interval)."""
    bam, variants, contig, tmp = sim_bam
    out = _run_cli(["call", "-r", os.path.join(DATA, "7seqs.fna"),
                    "-b", bam, "-o", tmp + "/lim_out", "--force-cpu",
                    "--limiting-interval", "0-500"])
    vcf = out["outputs"]["genomes"]["genome2"]["vcf"]
    positions = {int(l.split("\t")[1]) - 1
                 for l in open(vcf) if not l.startswith("#")}
    assert variants[0].pos in positions       # 300: inside the interval
    assert variants[1].pos not in positions   # 700: outside


def test_cli_dnds_and_fst(sim_bam, tmp_path_factory):
    """--calculate-dnds/--calculate-fst on the per-genome flow
    (lorikeet_engine.rs:1360 calculate_dnds, model/fst_calculator.rs)."""
    bam, variants, contig, tmp = sim_bam
    gff = tmp_path_factory.mktemp("dnds") / "genes.gff"
    # one CDS spanning the first injected variant (pos 300) on genome2~seq1;
    # prodigal-style seqname without the genome~ prefix
    gff.write_text("##gff-version 3\n"
                   "seq1\tprodigal\tCDS\t250\t450\t.\t+\t0\tID=gene1\n")
    out = _run_cli(["call", "-r", os.path.join(DATA, "7seqs.fna"),
                    "-b", bam, "-o", tmp + "/dnds_out", "--force-cpu",
                    "--calculate-dnds", "--gff-file", str(gff),
                    "--calculate-fst"])
    g2 = out["outputs"]["genomes"]["genome2"]
    assert os.path.exists(g2["dnds"])
    rows = [l.split("\t") for l in open(g2["dnds"]).read().splitlines()]
    assert len(rows) >= 2 and rows[1][0] == "gene1"
    # the CDS covers pos 300 -> at least one SNP counted
    snp_col = rows[0].index("sample0_snps")
    assert int(rows[1][snp_col]) >= 1
    assert os.path.exists(g2["fst"])


def test_man_pages(tmp_path, capsys):
    """`man` subcommand emits valid roff for every analysis subcommand
    (cli.rs:702-1016 full-help/man-page parity)."""
    from lorikeet_tpu.cli import main
    assert main(["man", "-o", str(tmp_path)]) == 0
    for cmd in ("call", "consensus", "genotype", "summarise"):
        page = (tmp_path / f"lorikeet-tpu-{cmd}.1").read_text()
        assert page.startswith(f'.TH "LORIKEET\\-TPU\\-{cmd.upper()}"')
        assert ".SH OPTIONS" in page and ".SH NAME" in page
    # stdout mode
    assert main(["man", "call"]) == 0
    out = capsys.readouterr().out
    assert "variant calling" in out


def test_full_help_and_aliases(capsys):
    """--full-help/--full-help-roff print and exit without required args
    (cli.rs:702-1016); -f/--genome-fasta-files and --read1/--read2 are
    accepted aliases (cli.rs:1192-1242)."""
    import pytest
    from lorikeet_tpu.cli import build_parser, main
    for flag, marker in (("--full-help", "usage: lorikeet-tpu call"),
                         ("--full-help-roff", '.TH "LORIKEET\\-TPU\\-CALL"')):
        with pytest.raises(SystemExit) as exc:
            main(["call", flag])
        assert exc.value.code == 0
        assert marker in capsys.readouterr().out
    p = build_parser()
    ns = p.parse_args(["call", "-f", "a.fna", "b.fna",
                       "--read1", "r1.fq", "--read2", "r2.fq", "-o", "x"])
    assert ns.reference == ["a.fna", "b.fna"]
    assert ns.read1 == ["r1.fq"] and ns.read2 == ["r2.fq"]


def test_mapping_reference_concatenates_multiple_genomes(tmp_path):
    """Several -r FASTAs become one coverm-style concatenated mapping
    reference with genome~contig names
    (mapping_index_maintenance.rs:250-340)."""
    import argparse
    from lorikeet_tpu.cli import _mapping_reference
    g1 = tmp_path / "gA.fna"
    g2 = tmp_path / "gB.fna"
    g1.write_text(">ctg1 desc\nACGT\n")
    g2.write_text(">ctg1\nTTTT\n>ctg2\nGGGG\n")
    args = argparse.Namespace(
        reference=[str(g1), str(g2)], genome_fasta_directory=None,
        genome_fasta_extension="fna", force=False)
    cache = str(tmp_path / "cache")
    ref = _mapping_reference(args, cache)
    text = open(ref).read()
    assert ">gA~ctg1\n" in text and ">gB~ctg1\n" in text \
        and ">gB~ctg2\n" in text
    # the concatenated file becomes the calling reference
    assert args.reference == [ref]
    # single reference passes through untouched
    args2 = argparse.Namespace(
        reference=[str(g1)], genome_fasta_directory=None,
        genome_fasta_extension="fna", force=False)
    assert _mapping_reference(args2, cache) == str(g1)


def test_limit_past_contig_end_is_empty(tmp_path):
    """A --limiting-interval starting beyond a short contig yields an empty
    result instead of crashing on a negative span."""
    import numpy as np
    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.io.bam_writer import write_bam
    from lorikeet_tpu.io.bam import BamReader
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.processing import call_contig
    from lorikeet_tpu.testkit.simulate import simulate_reads
    ref = tmp_path / "r.fna"
    seq = "ACGTACGGTACGCATCGCAT" * 100
    ref.write_text(f">c1\n{seq}\n")
    fr = FastaReader(str(ref))
    recs = simulate_reads(fr.fetch("c1"), [], coverage=3, seed=1, tid=0)
    bam = str(tmp_path / "r.bam")
    write_bam(bam, ["c1"], [len(seq)], recs)
    result = call_contig(FastaReader(str(ref)), [BamReader(bam)], "c1",
                         CallerConfig(use_pallas=False),
                         limit=(5000, 9000))
    assert result.calls == []


def test_cfg_fingerprint_ignores_execution_knobs():
    from lorikeet_tpu.calling.engine import CallerConfig
    from lorikeet_tpu.processing import _cfg_fingerprint
    a = _cfg_fingerprint(CallerConfig(threads=1))
    b = _cfg_fingerprint(CallerConfig(threads=16))
    c = _cfg_fingerprint(CallerConfig(ploidy=3))
    assert a == b
    assert a != c
