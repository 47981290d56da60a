"""Mapping layer: SAM parsing, sort + BAM write, mapper gating
(bam_generator.rs:460-1113, external_command_checker.rs)."""
import os

import numpy as np
import pytest

from lorikeet_tpu.io.bam import BamReader
from lorikeet_tpu.io.mapping import (
    build_mapper_command, check_for_external_command, map_reads_to_bam,
    parse_sam_stream,
)

SAM = """\
@HD\tVN:1.6\tSO:unsorted
@SQ\tSN:ctgA\tLN:1000
@SQ\tSN:ctgB\tLN:500
@RG\tID:1\tSM:samp1
r2\t0\tctgA\t151\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tNM:i:1
r1\t99\tctgA\t101\t60\t5M2I3M\t=\t201\t150\tACGTACGTAC\tIIIIIIIIII\tNM:i:2
r3\t0\tctgB\t11\t30\t4M\t*\t0\t0\tACGT\tIIII
r4\t4\t*\t0\t0\t*\t*\t0\t0\tAAAA\tIIII
"""


def test_parse_sam_stream():
    refs, lengths, records, header = parse_sam_stream(SAM.splitlines())
    assert refs == ["ctgA", "ctgB"] and lengths == [1000, 500]
    assert len(records) == 4
    r1 = next(r for r in records if r.name == "r1")
    assert r1.pos == 100 and r1.cigar == [("M", 5), ("I", 2), ("M", 3)]
    assert r1.is_paired and r1.mate_tid == 0 and r1.mate_pos == 200
    assert r1.tags["NM"] == 2
    assert bytes(r1.seq) == b"ACGTACGTAC"
    assert r1.qual.tolist() == [40] * 10


def test_map_reads_to_bam_with_override(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_text(SAM)
    out = str(tmp_path / "out" / "mapped.bam")
    map_reads_to_bam("minimap2-sr", "ref.fna", out, "reads.fq",
                     command_override=["cat", str(sam)],
                     discard_unmapped=True)
    r = BamReader(out)
    assert r.references == ["ctgA", "ctgB"]
    recs = list(r.fetch())
    # sorted by (tid, pos), unmapped discarded
    assert [x.name for x in recs] == ["r1", "r2", "r3"]
    assert r.sample_names() == ["samp1"]


def test_build_mapper_command_shapes():
    c = build_mapper_command("minimap2-sr", "ref.fna", "r1.fq", "r2.fq",
                             threads=4)
    assert c[:4] == ["minimap2", "-a", "-x", "sr"]
    assert c[-3:] == ["ref.fna", "r1.fq", "r2.fq"]
    c2 = build_mapper_command("bwa-mem", "ref.fna", "il.fq",
                              interleaved=True)
    assert "-p" in c2 and c2[-2:] == ["ref.fna", "il.fq"]
    with pytest.raises(ValueError):
        build_mapper_command("bowtie2", "r", "a")


def test_missing_mapper_raises(tmp_path):
    assert not check_for_external_command("definitely-not-a-mapper-xyz")
    with pytest.raises(RuntimeError, match="not found on PATH"):
        map_reads_to_bam("ngmlr-ont", "ref.fna",
                         str(tmp_path / "o.bam"), "r.fq")


def test_cli_raw_reads_end_to_end(tmp_path):
    """Drive the CLI with FASTQ input through a stub mapper on PATH."""
    import subprocess, sys, json
    from lorikeet_tpu.io.fasta import FastaReader
    from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

    DATA = "/root/reference/tests/data"
    if not os.path.isdir(DATA):
        pytest.skip("reference data absent")
    fr = FastaReader(os.path.join(DATA, "7seqs.fna"))
    contig = "genome2~seq1"
    tid = fr.names.index(contig)
    ref = fr.fetch(contig)
    alt = b"C" if ref[300] != ord("C") else b"T"
    recs = simulate_reads(ref, [Variant(300, bytes(ref[300:301]), alt)],
                          coverage=25, seed=5, allele_fraction=1.0, tid=tid)

    # write the simulated alignments as SAM; stub minimap2 cats it
    sam = tmp_path / "sim.sam"
    with open(sam, "w") as out:
        out.write("@HD\tVN:1.6\n")
        for name, ln in zip(fr.names, [fr.length(n) for n in fr.names]):
            out.write(f"@SQ\tSN:{name}\tLN:{ln}\n")
        for r in recs:
            q = "".join(chr(int(x) + 33) for x in r.qual)
            cig = "".join(f"{n}{op}" for op, n in r.cigar)
            out.write(f"{r.name}\t{r.flag}\t{fr.names[r.tid]}\t{r.pos + 1}"
                      f"\t{r.mapq}\t{cig}\t*\t0\t0\t"
                      f"{r.seq.tobytes().decode()}\t{q}\n")
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "minimap2"
    stub.write_text(f"#!/bin/sh\ncat '{sam}'\n")
    stub.chmod(0o755)

    fq = tmp_path / "reads_R1.fq"   # content unused by the stub
    fq.write_text("@r\nACGT\n+\nIIII\n")

    env = {**os.environ, "PATH": f"{bindir}:{os.environ['PATH']}",
           "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, "-m", "lorikeet_tpu.cli", "call",
         "-r", os.path.join(DATA, "7seqs.fna"),
         "--single", str(fq), "-o", str(tmp_path / "out"), "--force-cpu"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    vcf = out["outputs"]["genomes"]["genome2"]["vcf"]
    body = [l for l in open(vcf) if not l.startswith("#")]
    assert any(int(l.split("\t")[1]) == 301 for l in body)
    # mapped BAM cached under {out}/bams
    assert os.path.exists(tmp_path / "out" / "bams" / "reads_R1.bam")


def test_ngmlr_command_uses_r_and_q():
    """ngmlr takes no positional operands: -r REF -q READS."""
    c = build_mapper_command("ngmlr-ont", "ref.fna", "reads.fq", threads=2)
    assert c[:3] == ["ngmlr", "-x", "ont"]
    assert c[c.index("-r") + 1] == "ref.fna"
    assert c[c.index("-q") + 1] == "reads.fq"


def test_bwa_mem2_index_marker(tmp_path, monkeypatch):
    """bwa-mem2 writes .bwt.2bit.64, not .bwt — an existing index must not
    be rebuilt (mapping_index_maintenance.rs:166-186)."""
    from lorikeet_tpu.io import mapping
    ref = tmp_path / "ref.fna"
    ref.write_text(">a\nACGT\n")
    (tmp_path / "ref.fna.bwt.2bit.64").write_bytes(b"x")
    calls = []
    monkeypatch.setattr(mapping.subprocess, "run",
                        lambda *a, **k: calls.append(a))
    mapping.ensure_index("bwa-mem2", str(ref))
    assert calls == []
    mapping.ensure_index("bwa-mem", str(ref))   # .bwt missing -> index
    assert len(calls) == 1 and calls[0][0][0] == "bwa"
