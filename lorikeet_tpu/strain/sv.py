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

    # in-process QUAL filter + sort + merge (the bcftools role): records
    # are unified across samples by (contig, pos, ref, alt) with one
    # genotype column per sample, and sorted in header contig order —
    # concatenating bodies under one sample's header would misattribute
    # the other samples' genotype columns
    meta = None
    contig_order = {}
    sample_names = []
    merged = {}
    for s_idx, path in enumerate(per_sample):
        header, body = _read_vcf_lines(path)
        names = [ln.rstrip("\n").split("\t")[9:]
                 for ln in header if ln.startswith("#CHROM")]
        cols = names[0] if names and names[0] else []
        sample_names.append(cols[0] if cols else f"sample_{s_idx}")
        if meta is None:
            meta = [ln for ln in header if not ln.startswith("#CHROM")]
            for ln in meta:
                if ln.startswith("##contig="):
                    cname = ln.split("ID=")[1].split(",")[0].split(">")[0]
                    contig_order.setdefault(cname, len(contig_order))
        for line in body:
            f = line.rstrip("\n").split("\t")
            if len(f) < 8:
                continue
            try:
                qual = float(f[5]) if f[5] != "." else 0.0
            except ValueError:
                qual = 0.0
            if qual < min_sv_qual:
                continue
            key = (f[0], int(f[1]), f[3], f[4])
            entry = merged.setdefault(key, {"fixed": f[:9], "qual": qual,
                                            "gts": {}})
            entry["qual"] = max(entry["qual"], qual)
            entry["gts"][s_idx] = f[9] if len(f) > 9 else "./."
    out_path = os.path.join(output_prefix, "structural_variants.vcf.gz")
    n = len(per_sample)
    with gzip.open(out_path, "wt") as out:
        for line in meta or ["##fileformat=VCFv4.2\n"]:
            out.write(line)
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                  + "\t".join(sample_names) + "\n")
        keys = sorted(merged,
                      key=lambda k: (contig_order.get(k[0], len(contig_order)),
                                     k[0], k[1]))
        for key in keys:
            entry = merged[key]
            f = entry["fixed"]
            if len(f) < 9:
                f = f + ["GT"] * (9 - len(f))
            f[5] = f"{entry['qual']:g}"
            gts = [entry["gts"].get(i, "./.") for i in range(n)]
            out.write("\t".join(f[:9]) + "\t" + "\t".join(gts) + "\n")
    return out_path
