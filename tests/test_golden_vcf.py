"""Golden-VCF regression harness (VERDICT item 6).

Freezes the pipeline's full VCF output — QUAL, PL, GQ, AD, DP and every
INFO annotation — on deterministic simulated configurations, so that
parity work in later rounds cannot silently drift record-level output.
The reference's own BAM/FASTA fixtures are git-lfs pointers and
unavailable in-image (SURVEY §4), so these goldens are the frozen
conformance surface: they were produced by the pipeline whose unit-level
behavior is pinned to ported reference vectors (PL/QUAL/annotation
quirks in tests/test_genotyping_reference_quirks.py et al).

Regenerate deliberately with:
    LORIKEET_REGEN_GOLDENS=1 python -m pytest tests/test_golden_vcf.py
and review the diff like any other code change.
"""
import os

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("LORIKEET_REGEN_GOLDENS", "") == "1"


def _write_fasta(path, name, ref):
    with open(path, "w") as fh:
        fh.write(f">{name}\n")
        s = ref.tobytes().decode()
        for i in range(0, len(ref), 80):
            fh.write(s[i:i + 80] + "\n")


def _ref(seed, L):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    return bases[rng.integers(0, 4, L)]


def _snp(ref, pos):
    r = bytes(ref[pos:pos + 1])
    return Variant(pos, r, b"T" if r != b"T" else b"G")


def _mk_variants(ref):
    """SNPs + one insertion + one deletion, all well-separated."""
    vs = [_snp(ref, p) for p in (1200, 4400, 7800, 12000, 16500)]
    a = bytes(ref[9000:9001])
    vs.append(Variant(9000, a, a + b"ACCT"))                 # 4bp insertion
    d = bytes(ref[14000:14004])
    vs.append(Variant(14000, d, d[:1]))                      # 3bp deletion
    return sorted(vs, key=lambda v: v.pos)


def _run_call(tmp, fasta, bam_paths, **cfg_kw):
    from lorikeet_tpu.processing import run_call
    cfg = CallerConfig(use_pallas=False, threads=1, **cfg_kw)
    return run_call(str(fasta), [str(b) for b in bam_paths],
                    str(tmp / "out"), cfg)


def _check_golden(vcf_path, name):
    got = open(vcf_path).read()
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
        # byte-exact is the contract; show the first divergent record for
        # debuggability before failing
        got_l, want_l = got.splitlines(), want.splitlines()
        for i, (g, w) in enumerate(zip(got_l, want_l)):
            assert g == w, (f"{name} line {i + 1} drifted:\n"
                            f"  got:  {g}\n  want: {w}")
        assert len(got_l) == len(want_l), \
            f"{name}: record count {len(got_l)} != golden {len(want_l)}"


@pytest.fixture(scope="module")
def ds_diploid(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_diploid")
    ref = _ref(101, 20_000)
    fasta = tmp / "g.fna"
    _write_fasta(fasta, "gold~c1", ref)
    vs = _mk_variants(ref)
    recs = simulate_reads(ref, vs, coverage=25, seed=7, name_prefix="s")
    recs.sort(key=lambda r: (r.tid, r.pos))
    bam = tmp / "s0.bam"
    write_bam(str(bam), ["gold~c1"], [len(ref)], recs)
    return tmp, fasta, [bam], vs


def test_golden_diploid_single_sample(ds_diploid):
    tmp, fasta, bams, vs = ds_diploid
    vcf = _run_call(tmp, fasta, bams)
    _check_golden(vcf, "diploid_single.vcf")


def test_golden_diploid_recall(ds_diploid):
    """The golden itself must contain the planted truth (guards against
    freezing a broken output)."""
    tmp, fasta, bams, vs = ds_diploid
    vcf = _run_call(tmp, fasta, bams)
    from lorikeet_tpu.io.vcf import read_vcf
    contexts, _, _ = read_vcf(vcf)
    called = {(vc.start, bytes(vc.reference.bases),
               bytes(vc.alternate_alleles[0].bases)) for vc in contexts}
    hits = sum((v.pos, v.ref, v.alt) in called for v in vs)
    assert hits >= len(vs) - 1, (hits, len(vs), sorted(called))


@pytest.fixture(scope="module")
def ds_multisample(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_multi")
    ref = _ref(202, 15_000)
    fasta = tmp / "g.fna"
    _write_fasta(fasta, "gold~c1", ref)
    shared = [_snp(ref, p) for p in (2000, 6000, 10_500)]
    only_b = [_snp(ref, p) for p in (3500, 12_200)]
    bams = []
    for sidx, vs in enumerate([shared, shared + only_b]):
        recs = simulate_reads(ref, sorted(vs, key=lambda v: v.pos),
                              coverage=22 + 4 * sidx, seed=31 + sidx,
                              name_prefix=f"m{sidx}")
        recs.sort(key=lambda r: (r.tid, r.pos))
        p = tmp / f"m{sidx}.bam"
        write_bam(str(p), ["gold~c1"], [len(ref)], recs)
        bams.append(p)
    return tmp, fasta, bams


def test_golden_multisample(ds_multisample):
    tmp, fasta, bams = ds_multisample
    vcf = _run_call(tmp, fasta, bams)
    _check_golden(vcf, "multisample.vcf")


def test_golden_haploid(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_haploid")
    ref = _ref(303, 12_000)
    fasta = tmp / "g.fna"
    _write_fasta(fasta, "gold~c1", ref)
    vs = [_snp(ref, p) for p in (1800, 5200, 9100)]
    recs = simulate_reads(ref, vs, coverage=30, seed=13, name_prefix="h")
    recs.sort(key=lambda r: (r.tid, r.pos))
    bam = tmp / "h0.bam"
    write_bam(str(bam), ["gold~c1"], [len(ref)], recs)
    vcf = _run_call(tmp, fasta, [bam], ploidy=1)
    _check_golden(vcf, "haploid.vcf")


def test_golden_is_deterministic(ds_diploid, tmp_path):
    """Two fresh runs over the same inputs are byte-identical — the
    property the whole harness rests on."""
    tmp, fasta, bams, _ = ds_diploid
    from lorikeet_tpu.processing import run_call
    cfg = CallerConfig(use_pallas=False, threads=1)
    v1 = run_call(str(fasta), [str(b) for b in bams],
                  str(tmp_path / "o1"), cfg)
    v2 = run_call(str(fasta), [str(b) for b in bams],
                  str(tmp_path / "o2"), cfg)
    assert open(v1).read() == open(v2).read()
