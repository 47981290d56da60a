"""Structural-variant calling via svim on long-read BAMs.

Contract: /root/reference/src/processing/lorikeet_engine.rs:893-990
call_structural_variants — per long-read sample, `svim alignment
--skip_genotyping --min_mapq N --sequence_alleles` into
`{prefix}/svim_{idx}/`, then QUAL-filter + sort + merge into
`{prefix}/structural_variants.vcf.gz`.  The reference shells out to
bcftools/bgzip for the filter/sort/merge; here those steps run in-process
with our own VCF tooling (one external tool instead of three).
"""
from __future__ import annotations

import gzip
import os
import subprocess

from lorikeet_tpu.io.mapping import check_for_external_command
from lorikeet_tpu.utils.progress import log

DEFAULT_MIN_SV_QUAL = 3


def _read_vcf_lines(path: str):
    header, body = [], []
    with open(path) as fh:
        for line in fh:
            (header if line.startswith("#") else body).append(line)
    return header, body


def call_structural_variants(long_bam_paths: list, output_prefix: str,
                             reference: str, min_mapq: int = 20,
                             min_sv_qual: int = DEFAULT_MIN_SV_QUAL) -> str | None:
    """Returns the merged structural_variants.vcf.gz path, or None when
    svim is unavailable (logged, non-fatal — matching the reference's
    optional SV stage)."""
    if not long_bam_paths:
        return None
    if not check_for_external_command("svim"):
        log.warning("svim not found on PATH; skipping structural variant "
                    "calling (external_command_checker.rs:check_for_svim)")
        return None
    os.makedirs(output_prefix, exist_ok=True)
    per_sample = []
    for idx, bam in enumerate(long_bam_paths):
        svim_dir = os.path.join(output_prefix, f"svim_{idx}")
        os.makedirs(svim_dir, exist_ok=True)
        cmd = ["svim", "alignment", "--skip_genotyping",
               "--min_mapq", str(min_mapq), "--sequence_alleles",
               svim_dir, bam, reference]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            log.warning("svim failed for %s: %s", bam, proc.stderr[-500:])
            continue
        variants = os.path.join(svim_dir, "variants.vcf")
        if os.path.exists(variants):
            per_sample.append(variants)
    if not per_sample:
        return None

    # in-process QUAL filter + position sort + merge (bcftools role)
    merged_header = None
    records = []
    for path in per_sample:
        header, body = _read_vcf_lines(path)
        if merged_header is None:
            merged_header = header
        for line in body:
            f = line.split("\t")
            if len(f) < 8:
                continue
            try:
                qual = float(f[5]) if f[5] != "." else 0.0
            except ValueError:
                qual = 0.0
            if qual >= min_sv_qual:
                records.append((f[0], int(f[1]), line))
    records.sort(key=lambda r: (r[0], r[1]))
    out_path = os.path.join(output_prefix, "structural_variants.vcf.gz")
    with gzip.open(out_path, "wt") as out:
        for line in merged_header or ["##fileformat=VCFv4.2\n"]:
            out.write(line)
        for _, _, line in records:
            out.write(line)
    return out_path
