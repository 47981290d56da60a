"""Pairwise sample ANI: conANI / popANI / subpopANI.

Contract: /root/reference/src/ani_calculator/ani_calculator.rs:55-330.
- site filter: QD >= qual_by_depth_filter (25.0) (variant_context_utils.rs:99;
  the reference's qual_threshold comparison on log10_p_error is trivially
  true and reproduced as such);
- consensus allele per sample = argmax AD (variant_context.rs:485), allele
  presence = AD >= depth_per_sample_filter (:516);
- per qualifying site: conANI counts consensus differences (indel-aware base
  counts), popANI counts sites with NO shared allele, subpopANI counts any
  allele-set difference;
- denominators come from the compared-bases matrix (run-length encoded
  passing-depth arrays, :104-170), or genome_size when absent;
- outputs three TSV matrices (consensus_ani/population_ani/subpopulation_ani).
"""
from __future__ import annotations

import os

import numpy as np

QUAL_BY_DEPTH_FILTER = 25.0
DEPTH_PER_SAMPLE_FILTER = 5


def compared_bases_from_rle(passing_sites: list | None, genome_size: int,
                            n_samples: int) -> np.ndarray:
    """Comparable-base matrix from per-sample run-length encoded depth-pass
    arrays (positive run = passing, negative run = failing)."""
    out = np.full((n_samples, n_samples), float(genome_size), np.float64)
    if passing_sites is None:
        return out
    # expand RLE to boolean arrays (host-side clarity over the reference's
    # dual-cursor walk; same results)
    masks = []
    for rle in passing_sites:
        m = np.zeros(genome_size, bool)
        pos = 0
        for run in rle:
            ln = abs(int(run))
            if run > 0:
                m[pos:pos + ln] = True
            pos += ln
        masks.append(m)
    for i in range(n_samples):
        out[i, i] = masks[i].sum()
        for j in range(i + 1, n_samples):
            comparable = np.count_nonzero(masks[i] & masks[j])
            out[i, j] = out[j, i] = comparable
    return out


def site_passes(vc, qual_by_depth_filter=QUAL_BY_DEPTH_FILTER) -> bool:
    """variant_context_utils.rs:81-97 passes_thresholds: honour a cached
    QF annotation, else fall back to the QD threshold."""
    qf = vc.attributes.get("QF")
    if qf in ("true", "false"):
        return qf == "true"
    qd = vc.attributes.get("QD")
    if isinstance(qd, list):
        qd = qd[0]
    if qd is not None:
        return float(qd) >= qual_by_depth_filter
    return True


class ANICalculator:
    def __init__(self, n_samples: int):
        self.conANI = np.zeros((n_samples, n_samples))
        self.popANI = np.zeros((n_samples, n_samples))
        self.subpopANI = np.zeros((n_samples, n_samples))
        self.n = n_samples

    def consume(self, contexts, depth_filter=DEPTH_PER_SAMPLE_FILTER):
        for vc in contexts:
            if not site_passes(vc):
                continue
            cons = []
            present = []
            for g in vc.genotypes:
                ad = g.ad if g.ad is not None else np.zeros(vc.n_alleles, np.int64)
                if len(ad) < vc.n_alleles:
                    ad = np.pad(np.asarray(ad), (0, vc.n_alleles - len(ad)))
                ci = int(np.argmax(ad)) if ad.max() > 0 else None
                cons.append(ci if ci is not None else 0)
                present.append(np.asarray(ad) >= depth_filter)
            for i in range(self.n):
                if not present[i].any():
                    continue
                for j in range(i + 1, self.n):
                    if not present[j].any():
                        continue
                    if cons[i] != cons[j]:
                        li = len(vc.alleles[cons[i]])
                        lj = len(vc.alleles[cons[j]])
                        diff = abs(li - lj) if (li > 1 or lj > 1) else 1.0
                        self.conANI[i, j] += diff
                        self.conANI[j, i] += diff
                    bases_diff = 0.0
                    divisor = 0.0
                    for a in range(vc.n_alleles):
                        if present[i][a] != present[j][a]:
                            bases_diff += len(vc.alleles[a])
                            divisor += 1.0
                    bases_diff /= divisor if divisor > 0 else 1.0
                    if not (present[i] & present[j]).any():
                        self.popANI[i, j] += bases_diff
                        self.popANI[j, i] += bases_diff
                    if (present[i] != present[j]).any():
                        self.subpopANI[i, j] += bases_diff
                        self.subpopANI[j, i] += bases_diff

    def write_tables(self, output_prefix: str, sample_names, reference_name: str,
                     compared_bases: np.ndarray):
        paths = {}
        for mat, tag in ((self.conANI, "consensus_ani"),
                         (self.popANI, "population_ani"),
                         (self.subpopANI, "subpopulation_ani")):
            path = f"{output_prefix}_{tag}.tsv"
            with open(path, "w") as out:
                out.write("##reference={}\n".format(reference_name))
                out.write("SampleID\t" + "\t".join(sample_names) + "\n")
                for i, name in enumerate(sample_names):
                    vals = []
                    for j in range(self.n):
                        denom = max(compared_bases[i, j], 1.0)
                        vals.append(f"{1.0 - mat[i, j] / denom:.6f}")
                    out.write(name + "\t" + "\t".join(vals) + "\n")
            paths[tag] = path
        return paths


def run_ani(contexts, output_prefix, sample_names, reference_name,
            genome_size, passing_sites=None):
    calc = ANICalculator(len(sample_names))
    calc.consume(contexts)
    cb = compared_bases_from_rle(passing_sites, genome_size, len(sample_names))
    return calc.write_tables(output_prefix, sample_names, reference_name, cb)


def run_summarise(vcf_paths: list, output_dir: str,
                  calculate_fst: bool = False) -> dict:
    """`summarise` mode: ANI tables (and optionally Hudson Fst) from
    existing VCFs (lorikeet_engine.rs:1224-1305)."""
    from lorikeet_tpu.io.vcf import read_vcf
    os.makedirs(output_dir, exist_ok=True)
    outputs = {}
    for path in vcf_paths:
        contexts, contigs, samples = read_vcf(path)
        if not samples:
            samples = ["sample0"]
        # genome size from contig headers
        genome_size = 0
        with open(path) as fh:
            for line in fh:
                if line.startswith("##contig=") and "length=" in line:
                    # length is optional per VCF 4.2
                    genome_size += int(line.split("length=")[1]
                                       .split(">")[0].split(",")[0])
                elif not line.startswith("#"):
                    break
        name = os.path.splitext(os.path.basename(path))[0]
        prefix = os.path.join(output_dir, name)
        outputs[name] = run_ani(contexts, prefix, samples, name,
                                max(genome_size, 1))
        if calculate_fst:
            from lorikeet_tpu.strain.fst import write_fst
            outputs[name]["fst"] = write_fst(contexts, len(samples), samples,
                                             output_dir, name)
    return outputs
