"""Structural-variant stage (lorikeet_engine.rs:893-990) with a stub svim."""
import gzip
import os
import stat
import subprocess
import sys

import pytest

from lorikeet_tpu.strain.sv import call_structural_variants


@pytest.fixture()
def stub_svim(tmp_path, monkeypatch):
    """A fake svim on PATH that writes a variants.vcf into its working dir."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "svim"
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, os\n"
        "# args: alignment --skip_genotyping --min_mapq N "
        "--sequence_alleles DIR BAM REF\n"
        "d = sys.argv[sys.argv.index('--sequence_alleles') + 1]\n"
        "os.makedirs(d, exist_ok=True)\n"
        "with open(os.path.join(d, 'variants.vcf'), 'w') as out:\n"
        "    out.write('##fileformat=VCFv4.2\\n')\n"
        "    out.write('#CHROM\\tPOS\\tID\\tREF\\tALT\\tQUAL\\tFILTER\\tINFO\\n')\n"
        "    out.write('c1\\t500\\tsvim.DEL.1\\tN\\t<DEL>\\t9\\tPASS\\tSVTYPE=DEL\\n')\n"
        "    out.write('c1\\t100\\tsvim.INS.1\\tN\\t<INS>\\t5\\tPASS\\tSVTYPE=INS\\n')\n"
        "    out.write('c1\\t300\\tsvim.DUP.1\\tN\\t<DUP>\\t1\\tPASS\\tSVTYPE=DUP\\n')\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


def test_sv_calling_filters_sorts_merges(tmp_path, stub_svim):
    out = call_structural_variants(["a.bam"], str(tmp_path / "sv"),
                                   "ref.fna", min_sv_qual=3)
    assert out and out.endswith("structural_variants.vcf.gz")
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    # QUAL 1 filtered out; sorted by position
    assert len(body) == 2
    assert [int(l.split("\t")[1]) for l in body] == [100, 500]


def test_sv_skipped_without_svim(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty PATH
    assert call_structural_variants(["a.bam"], str(tmp_path / "sv"),
                                    "ref.fna") is None


def test_shell_completion():
    proc = subprocess.run(
        [sys.executable, "-m", "lorikeet_tpu.cli", "shell-completion"],
        capture_output=True, text=True, cwd="/root/repo")
    assert proc.returncode == 0
    assert "complete -F _lorikeet_tpu" in proc.stdout
    assert "genotype" in proc.stdout


def test_sv_merge_unifies_across_samples(tmp_path, monkeypatch):
    """bcftools-merge semantics: shared records unify with one genotype
    column per sample; contig order follows the header, not lexical order
    (lorikeet_engine.rs:947-989)."""
    import stat
    bindir = tmp_path / "bin2"
    bindir.mkdir()
    stub = bindir / "svim"
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, os\n"
        "d = sys.argv[sys.argv.index('--sequence_alleles') + 1]\n"
        "bam = sys.argv[sys.argv.index('--sequence_alleles') + 2]\n"
        "os.makedirs(d, exist_ok=True)\n"
        "sm = os.path.basename(bam).split('.')[0]\n"
        "with open(os.path.join(d, 'variants.vcf'), 'w') as out:\n"
        "    out.write('##fileformat=VCFv4.2\\n')\n"
        "    out.write('##contig=<ID=contig2,length=100>\\n')\n"
        "    out.write('##contig=<ID=contig10,length=100>\\n')\n"
        "    out.write('#CHROM\\tPOS\\tID\\tREF\\tALT\\tQUAL\\tFILTER\\t'\n"
        "              'INFO\\tFORMAT\\t' + sm + '\\n')\n"
        "    out.write('contig10\\t100\\tsvim.INS.1\\tN\\t<INS>\\t9\\tPASS\\t'\n"
        "              'SVTYPE=INS\\tGT\\t0/1\\n')\n"
        "    if sm == 's1':\n"
        "        out.write('contig2\\t50\\tsvim.DEL.1\\tN\\t<DEL>\\t8\\tPASS\\t'\n"
        "                  'SVTYPE=DEL\\tGT\\t1/1\\n')\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    out = call_structural_variants(["s0.bam", "s1.bam"],
                                   str(tmp_path / "sv2"), "ref.fna",
                                   min_sv_qual=3)
    lines = gzip.open(out, "rt").read().splitlines()
    chrom = next(l for l in lines if l.startswith("#CHROM"))
    assert chrom.split("\t")[9:] == ["s0", "s1"]
    body = [l.split("\t") for l in lines if not l.startswith("#")]
    assert len(body) == 2                      # shared INS unified
    assert body[0][0] == "contig2"             # header order, not lexical
    ins = next(r for r in body if r[4] == "<INS>")
    assert ins[9:] == ["0/1", "0/1"]
    dele = next(r for r in body if r[4] == "<DEL>")
    assert dele[9:] == ["./.", "1/1"]          # sample-0 has no DEL call
