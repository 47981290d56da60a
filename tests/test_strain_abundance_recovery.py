"""End-to-end strain recovery accuracy.

Two simulated strains mixed at known per-sample fractions across three
samples: genotype mode must recover exactly two variant groups / strains
and per-sample abundances close to the simulated mixing fractions
(the lorikeet_engine genotype-mode contract; no analogous automated test
exists in the reference — SURVEY §4 notes the strain layer is untested
there).
"""
import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads


@pytest.fixture(scope="module")
def strain_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("strains")
    rng = np.random.default_rng(5)
    L = 60_000
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, L)]
    fasta = tmp / "g.fna"
    with open(fasta, "w") as fh:
        fh.write(">gx~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    def mkvars(start):
        out = []
        for pos in range(start, L - 1000, 3000):
            r = bytes(ref[pos:pos + 1])
            out.append(Variant(pos, r, b"T" if r != b"T" else b"G"))
        return out

    va, vb = mkvars(1000), mkvars(2500)
    fracs = [0.8, 0.3, 0.5]
    bam_paths = []
    for sidx, fa in enumerate(fracs):
        recs = simulate_reads(ref, va, coverage=22 * fa, seed=sidx * 2,
                              name_prefix=f"a{sidx}")
        recs += simulate_reads(ref, vb, coverage=22 * (1 - fa),
                               seed=sidx * 2 + 1, name_prefix=f"b{sidx}")
        recs.sort(key=lambda r: (r.tid, r.pos))
        path = tmp / f"s{sidx}.bam"
        write_bam(str(path), ["gx~c1"], [L], recs)
        bam_paths.append(str(path))

    from lorikeet_tpu.processing import start_engine
    cfg = CallerConfig(use_pallas=False, threads=1,
                       qual_by_depth_filter=8.0)
    out = start_engine("genotype", [str(fasta)], bam_paths,
                       str(tmp / "out"), cfg)
    return out["gx"], fracs


def test_two_strains_recovered(strain_run):
    out, _ = strain_run
    assert out["n_variant_groups"] == 2
    assert out["n_strains"] == 2
    assert len(out["strain_fastas"]) == 2


def test_abundances_match_mixing_fractions(strain_run):
    out, fracs = strain_run
    table = {}
    with open(out["strain_coverages"]) as fh:
        header = fh.readline().split()
        for line in fh:
            cols = line.split()
            table[cols[0]] = [float(x) for x in cols[1:]]
    assert len(table) == 2
    rows = list(table.values())
    want_a = np.asarray(fracs)
    # strain identity order is arbitrary: match by closest profile
    errs = [min(np.abs(np.asarray(r) - want_a).max(),
                np.abs(np.asarray(r) - (1 - want_a)).max()) for r in rows]
    assert max(errs) < 0.12, (table, fracs)


def test_reference_strain_detected_and_quantified(tmp_path):
    """A sample mixing the unmodified reference (40%) with one variant
    strain (60%): genotype mode must add a reference-strain row near 0.4
    and scale the variant strain to ~0.6
    (abundance_calculator_engine.rs:42-52,485-500 reference-strain
    heuristic; quantified here by leftover alt mass)."""
    rng = np.random.default_rng(11)
    L = 40_000
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, L)]
    fasta = tmp_path / "g.fna"
    with open(fasta, "w") as fh:
        fh.write(">gr~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")
    variants = []
    for pos in range(1000, L - 1000, 2500):
        r = bytes(ref[pos:pos + 1])
        variants.append(Variant(pos, r, b"T" if r != b"T" else b"G"))
    recs = simulate_reads(ref, variants, coverage=30 * 0.6, seed=2,
                          name_prefix="a")
    recs += simulate_reads(ref, [], coverage=30 * 0.4, seed=3,
                           name_prefix="r")
    recs.sort(key=lambda r: (r.tid, r.pos))
    bam = str(tmp_path / "s.bam")
    write_bam(bam, ["gr~c1"], [L], recs)
    from lorikeet_tpu.processing import start_engine
    cfg = CallerConfig(use_pallas=False, qual_by_depth_filter=8.0)
    out = start_engine("genotype", [str(fasta)], [bam],
                       str(tmp_path / "out"), cfg)["gr"]
    assert out["reference_strain_present"]
    table = {}
    with open(out["strain_coverages"]) as fh:
        fh.readline()
        for line in fh:
            cols = line.split()
            table[cols[0]] = [float(x) for x in cols[1:]]
    assert "strain_reference" in table
    assert abs(table["strain_reference"][0] - 0.4) < 0.12
    others = [v[0] for k, v in table.items() if k != "strain_reference"]
    assert abs(sum(others) - 0.6) < 0.12
