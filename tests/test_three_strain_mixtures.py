"""Three-strain mixture recovery across six samples.

Scaled-down version of the 8-sample stress run: three simulated strains
(15 SNPs each) mixed at known per-sample fractions across six samples.
Genotype mode must recover exactly three variant groups, each matching one
true strain's variant set, and per-sample abundances close to the mixing
matrix (haplotype_clustering_engine.rs + linkage_engine.rs +
abundance_calculator_engine.rs; the reference has no automated test of
this layer — SURVEY §4)."""
import pickle

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

BASES = np.frombuffer(b"ACGT", np.uint8)

MIX = np.array([
    [1.0, 0.0, 0.0],
    [0.7, 0.3, 0.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
    [0.3, 0.0, 0.7],
    [0.4, 0.35, 0.25],
])


@pytest.fixture(scope="module")
def mixture_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mix3")
    rng = np.random.default_rng(7)
    L = 36_000
    ref = BASES[rng.integers(0, 4, L)]
    fasta = tmp / "g.fna"
    with open(fasta, "w") as fh:
        fh.write(">gmix~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    def mkstrain(seed, n=15):
        r = np.random.default_rng(seed)
        pos = np.sort(r.choice(np.arange(500, L - 500), n, replace=False))
        out = []
        for p in pos:
            refb = bytes(ref[p:p + 1])
            alt = b"T" if refb != b"T" else b"G"
            out.append(Variant(int(p), refb, alt))
        return out

    strains = [mkstrain(11), mkstrain(22), mkstrain(33)]
    bam_paths = []
    for sidx, fracs in enumerate(MIX):
        recs = []
        for k, (st, fr) in enumerate(zip(strains, fracs)):
            if fr <= 0:
                continue
            recs += simulate_reads(ref, st, coverage=32 * fr,
                                   seed=100 * sidx + k,
                                   name_prefix=f"r{sidx}_{k}_")
        recs.sort(key=lambda r: (r.tid, r.pos))
        path = tmp / f"s{sidx}.bam"
        write_bam(str(path), ["gmix~c1"], [L], recs)
        bam_paths.append(str(path))

    from lorikeet_tpu.processing import start_engine
    cfg = CallerConfig(use_pallas=False, threads=1,
                       qual_by_depth_filter=8.0)
    out = start_engine("genotype", [str(fasta)], bam_paths,
                       str(tmp / "out"), cfg)
    truth = [set(v.pos for v in st) for st in strains]
    return out["gmix"], truth


def _vcf_groups(vcf_path):
    groups = {}
    for line in open(vcf_path):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        vg = info.get("VG")
        if vg is not None:
            groups.setdefault(vg, set()).add(int(f[1]) - 1)
    return groups


def test_three_groups_match_true_strains(mixture_run):
    out, truth = mixture_run
    assert out["n_variant_groups"] == 3
    groups = _vcf_groups(out["vcf"])
    assert len(groups) == 3
    matched = set()
    for poss in groups.values():
        best = max(range(3), key=lambda i: len(poss & truth[i]))
        # every recovered group is exactly one true strain's variant set
        assert poss == truth[best]
        matched.add(best)
    assert matched == {0, 1, 2}


def test_abundances_track_mixing_matrix(mixture_run):
    out, truth = mixture_run
    table = {}
    with open(out["strain_coverages"]) as fh:
        fh.readline()
        for line in fh:
            cols = line.split()
            table[cols[0]] = np.asarray([float(x) for x in cols[1:]])
    assert len(table) == 3
    # match recovered strain rows to true mixture columns by least error
    rows = list(table.values())
    best_err = []
    for col in range(3):
        want = MIX[:, col]
        best_err.append(min(np.abs(r - want).max() for r in rows))
    assert max(best_err) < 0.15, (table, MIX)
