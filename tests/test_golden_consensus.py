"""Golden regression for CONSENSUS mode: freezes the per-sample consensus
FASTAs byte-exact on a deterministic 2-sample run (reference contract:
ReferenceWriter::generate_consensus, reference_writer.rs:120-240 —
per-sample consensus alleles spliced into the reference).

Regenerate deliberately with:
    LORIKEET_REGEN_GOLDENS=1 python -m pytest tests/test_golden_consensus.py
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


def _check_golden(path, name):
    """Returns True when the golden was (re)generated instead of checked."""
    got = open(path).read()
    golden_path = os.path.join(GOLDEN_DIR, name)
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(golden_path, "w") as fh:
            fh.write(got)
        return True
    assert os.path.exists(golden_path), \
        f"golden {name} missing — run with LORIKEET_REGEN_GOLDENS=1"
    want = open(golden_path).read()
    assert got == want, f"{name} drifted"
    return False


@pytest.fixture(scope="module")
def consensus_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_cons")
    rng = np.random.default_rng(23)
    L = 15_000
    ref = BASES[rng.integers(0, 4, L)]
    fasta = tmp / "g.fna"
    with open(fasta, "w") as fh:
        fh.write(">cgold~c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    def snp(p):
        r = bytes(ref[p:p + 1])
        return Variant(p, r, b"T" if r != b"T" else b"G")

    shared = [snp(p) for p in (2500, 7000)]
    only_b = [snp(p) for p in (4200, 11_000)]
    ins = Variant(9000, bytes(ref[9000:9001]),
                  bytes(ref[9000:9001]) + b"GG")
    dele = Variant(12_500, bytes(ref[12_500:12_504]),
                   bytes(ref[12_500:12_501]))
    bams = []
    for sidx, vs in enumerate([shared + [ins], shared + only_b + [dele]]):
        recs = simulate_reads(ref, sorted(vs, key=lambda v: v.pos),
                              coverage=28, seed=61 + sidx,
                              name_prefix=f"c{sidx}")
        recs.sort(key=lambda r: (r.tid, r.pos))
        p = tmp / f"c{sidx}.bam"
        write_bam(str(p), ["cgold~c1"], [L], recs)
        bams.append(str(p))

    from lorikeet_tpu.processing import start_engine
    out = start_engine("consensus", [str(fasta)], bams, str(tmp / "out"),
                       CallerConfig(use_pallas=False, threads=1))
    return out["cgold"], [v.pos for v in shared]


def test_golden_consensus_fastas(consensus_run):
    out, _ = consensus_run
    files = out.get("consensus")
    assert files and len(files) == 2, out
    regen = False
    for path in sorted(files):
        regen |= _check_golden(path, "consensus_" + os.path.basename(path))
    if regen:
        pytest.skip("regenerated consensus goldens")


def test_consensus_applies_shared_snps(consensus_run):
    """Guard: the frozen FASTAs actually differ from the reference at the
    shared SNP positions in BOTH samples."""
    out, shared_pos = consensus_run
    for path in out["consensus"]:
        seq = "".join(l.strip() for l in open(path) if not l.startswith(">"))
        # both consensus genomes carry an alt at the first shared SNP
        assert seq[shared_pos[0]] in "TG"
