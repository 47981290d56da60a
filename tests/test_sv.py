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


def _svim_vcf(path, sample, contigs, records):
    """records: list of (chrom, pos, id, ref, alt, qual, filt, info, gt)"""
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("##source=svim-2.0.0\n")
        for c in contigs:
            fh.write(f"##contig=<ID={c}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 f"{sample}\n")
        for r in records:
            fh.write("\t".join(map(str, r[:8])) + f"\tGT\t{r[8]}\n")


def _merged_records(out_path):
    import gzip
    op = gzip.open if out_path.endswith(".gz") else open
    with op(out_path, "rt") as fh:
        lines = fh.read().splitlines()
    header = [l for l in lines if l.startswith("#")]
    body = [l.split("\t") for l in lines if not l.startswith("#")]
    return header, body


def test_merge_bcftools_parity_semantics(tmp_path):
    """bcftools merge|sort parity fixture (lorikeet_engine.rs:947-989):
    multiallelic combine, REF extension, GT remap, missing-QUAL drop,
    --force-samples renaming, union-header contig sort order."""
    from lorikeet_tpu.strain.sv import merge_sv_vcfs
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    # sample A: contigs c1,c2; deletion at c1:100 (REF longer), SV at c2:50,
    # a record with missing QUAL (must drop), unsorted body (sort check)
    _svim_vcf(str(a), "Sample", ["c1", "c2"], [
        ("c2", 50, "svA2", "T", "TAAAG", 12, "PASS", "SVTYPE=INS", "1/1"),
        ("c1", 100, "svA1", "GTTT", "G", 9, "PASS", "SVTYPE=DEL", "0/1"),
        ("c1", 300, "svA3", "A", "ACC", ".", "PASS", "SVTYPE=INS", "1/1"),
    ])
    # sample B (duplicate name "Sample"): at c1:100 a SHORTER ref with a
    # DIFFERENT alt -> multiallelic after extension; private record at c3:7
    _svim_vcf(str(b), "Sample", ["c1", "c3"], [
        ("c1", 100, "svB1", "GT", "G", 20, "PASS", "SVTYPE=DEL", "1/1"),
        ("c3", 7, "svB2", "C", "CGG", 5, "PASS", "SVTYPE=INS", "0/1"),
    ])
    out = merge_sv_vcfs([str(a), str(b)], str(tmp_path / "merged.vcf"),
                        min_sv_qual=3)
    header, body = _merged_records(out)
    chrom_line = [h for h in header if h.startswith("#CHROM")][0]
    assert chrom_line.split("\t")[9:] == ["Sample", "2:Sample"]

    # sorted: c1 before c2 before c3 (union header order), pos ascending
    assert [(r[0], int(r[1])) for r in body] == \
        [("c1", 100), ("c2", 50), ("c3", 7)]

    rec = body[0]
    # REF extension: GTTT (longest) wins; B's G alt gains 'TT' -> GTT
    assert rec[3] == "GTTT"
    assert rec[4] == "G,GTT"
    assert rec[5] == "20"                    # max QUAL across merged
    # GT remap: A's 0/1 keeps index 1 (G); B's 1/1 remaps to allele 2 (GTT)
    assert rec[9] == "0/1" and rec[10] == "2/2"

    # sample-private records carry ./. for the absent sample
    assert body[1][9] == "1/1" and body[1][10] == "./."
    assert body[2][9] == "./." and body[2][10] == "0/1"
    # the missing-QUAL record was dropped entirely
    assert not any(int(r[1]) == 300 for r in body)


def test_merge_qual_dot_fails_even_at_zero_threshold(tmp_path):
    from lorikeet_tpu.strain.sv import merge_sv_vcfs
    a = tmp_path / "a.vcf"
    _svim_vcf(str(a), "s0", ["c1"], [
        ("c1", 5, "x", "A", "AT", ".", "PASS", "SVTYPE=INS", "1/1"),
        ("c1", 9, "y", "A", "AG", 0, "PASS", "SVTYPE=INS", "1/1"),
    ])
    out = merge_sv_vcfs([str(a)], str(tmp_path / "m.vcf"), min_sv_qual=0)
    _, body = _merged_records(out)
    assert [int(r[1]) for r in body] == [9]
