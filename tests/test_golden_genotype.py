"""Golden regression for GENOTYPE mode (VERDICT r2 item 10): freezes the
full strain-resolution output surface — the VG/ST-annotated VCF, the
per-sample strain coverage TSV, and the three ANI matrices — byte-exact on
a deterministic 2-strain x 4-sample mixture.

The reference has no automated test of this layer (SURVEY §4); these
goldens pin the clustering -> linkage -> abundance -> annotation chain
(haplotype_clustering_engine.rs:63, linkage_engine.rs:73,
abundance_calculator_engine.rs:42) against drift.

Regenerate deliberately with:
    LORIKEET_REGEN_GOLDENS=1 python -m pytest tests/test_golden_genotype.py
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("LORIKEET_REGEN_GOLDENS", "") == "1"
BASES = np.frombuffer(b"ACGT", np.uint8)

MIX = np.array([
    [1.0, 0.0],
    [0.0, 1.0],
    [0.65, 0.35],
    [0.25, 0.75],
])


def _check_golden(path, name):
    got = open(path).read()
    golden_path = os.path.join(GOLDEN_DIR, name)
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(golden_path, "w") as fh:
            fh.write(got)
        pytest.skip(f"regenerated {name}")
    assert os.path.exists(golden_path), \
        f"golden {name} missing — run with LORIKEET_REGEN_GOLDENS=1"
    want = open(golden_path).read()
    if got != want:
        got_l, want_l = got.splitlines(), want.splitlines()
        for i, (g, w) in enumerate(zip(got_l, want_l)):
            assert g == w, (f"{name} line {i + 1} drifted:\n"
                            f"  got:  {g}\n  want: {w}")
        assert len(got_l) == len(want_l), \
            f"{name}: record count {len(got_l)} != golden {len(want_l)}"


@pytest.fixture(scope="module")
def genotype_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_geno")
    rng = np.random.default_rng(17)
    L = 24_000
    ref = BASES[rng.integers(0, 4, L)]
    fasta = tmp / "g.fna"
    with open(fasta, "w") as fh:
        fh.write(">ggold~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    def mkstrain(seed, n=10):
        r = np.random.default_rng(seed)
        pos = np.sort(r.choice(np.arange(500, L - 500), n, replace=False))
        out = []
        for p in pos:
            refb = bytes(ref[p:p + 1])
            alt = b"T" if refb != b"T" else b"G"
            out.append(Variant(int(p), refb, alt))
        return out

    strains = [mkstrain(41), mkstrain(42)]
    bam_paths = []
    for sidx, fracs in enumerate(MIX):
        recs = []
        for k, (st, fr) in enumerate(zip(strains, fracs)):
            if fr <= 0:
                continue
            recs += simulate_reads(ref, st, coverage=30 * fr,
                                   seed=500 * sidx + k,
                                   name_prefix=f"g{sidx}_{k}_")
        recs.sort(key=lambda r: (r.tid, r.pos))
        path = tmp / f"s{sidx}.bam"
        write_bam(str(path), ["ggold~c1"], [L], recs)
        bam_paths.append(str(path))

    from lorikeet_tpu.processing import start_engine
    cfg = CallerConfig(use_pallas=False, threads=1,
                       qual_by_depth_filter=8.0)
    out = start_engine("genotype", [str(fasta)], bam_paths,
                       str(tmp / "out"), cfg)
    gdir = os.path.join(str(tmp / "out"), "ggold")
    truth = [set(v.pos for v in st) for st in strains]
    return out["ggold"], gdir, truth


def test_golden_genotype_vcf(genotype_run):
    out, gdir, _ = genotype_run
    _check_golden(os.path.join(gdir, "ggold.vcf"), "genotype_mode.vcf")


def test_golden_strain_coverages(genotype_run):
    out, gdir, _ = genotype_run
    _check_golden(out["strain_coverages"], "genotype_strain_coverages.tsv")


@pytest.mark.parametrize("tag", ["consensus", "population", "subpopulation"])
def test_golden_ani(genotype_run, tag):
    out, gdir, _ = genotype_run
    path = out["ani"][f"{tag}_ani"]
    _check_golden(path, f"genotype_{tag}_ani.tsv")


def test_golden_groups_match_truth(genotype_run):
    """Guard: the frozen output actually resolves the planted strains (one
    variant group per strain, group members == strain variant sets)."""
    out, gdir, truth = genotype_run
    groups = {}
    for line in open(os.path.join(gdir, "ggold.vcf")):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        vg = info.get("VG")
        if vg is not None:
            groups.setdefault(vg, set()).add(int(f[1]) - 1)
    recovered = sorted(groups.values(), key=sorted)
    assert sorted(map(sorted, recovered)) == \
        sorted(map(sorted, truth)), (recovered, truth)
