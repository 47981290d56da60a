"""Assembler fidelity over repeat-rich references.

The reference's assembler suite runs on real human windows
(/root/reference/tests/read_threading_assembler_unit_tests.rs:45-225 over
Homo_sapiens_assembly19_chr1_1M.fasta — a git-lfs pointer in this image);
uniform-random DNA has no homopolymers, STRs, or low-complexity tracts,
exactly the structures that stress dangling-end recovery and kmer-size
retry (src/read_threading/read_threading_assembler.rs:419-450).  These
tests re-run the ref/SNP/indel recovery families over synthetic windows
with planted homopolymers (8-20 bp), STRs (unit 2-6 x 4-12) and
low-entropy segments (testkit.simulate.repeat_rich_reference)."""
import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import assemble_region
from lorikeet_tpu.io.bam import BamRecord
from lorikeet_tpu.testkit.simulate import (
    Variant, apply_variants, repeat_rich_reference,
    repeat_rich_reference_with_features,
)

BASES = np.frombuffer(b"ACGT", np.uint8)
SEEDS = [0, 1, 2, 3, 4]


def _reads_from(seq, read_len=100, stride=5, qual=30, prefix="r"):
    recs = []
    for k, s in enumerate(range(0, len(seq) - read_len + 1, stride)):
        bases = np.asarray(seq[s:s + read_len], np.uint8).copy()
        recs.append(BamRecord(
            name=f"{prefix}{k}", flag=0, tid=0, pos=s, mapq=60,
            cigar=[("M", read_len)], seq=bases,
            qual=np.full(read_len, qual, np.uint8)))
    return recs


def _haps(ref, reads, **kw):
    out = assemble_region(ref, {0: reads}, **kw)
    return {h.bases for h in out}, out


def _feature(features, kind, lo=60, hi_margin=120, length=None):
    """First planted feature of `kind` comfortably inside the window."""
    for fk, s, e in features:
        if fk == kind and s > lo and e < length - hi_margin:
            return s, e
    return None


@pytest.mark.parametrize("seed", SEEDS)
def test_repeat_rich_ref_only(seed):
    ref = repeat_rich_reference(600, seed=seed, feature_gap=(60, 160))
    haps, _ = _haps(ref, _reads_from(ref))
    assert haps == {ref.tobytes()}


@pytest.mark.parametrize("seed", SEEDS)
def test_snp_inside_repeat_recovered(seed):
    ref, features = repeat_rich_reference_with_features(600, seed=seed, feature_gap=(60, 160))
    # lo=150: the variant needs >= max-escalated-k upstream context inside
    # the window, or the alt path is an unanchorable dangling head — the
    # reference declines that merge too (merge point past the ref source,
    # read_threading_graph.rs merge_dangling_head); production windows
    # always carry ~100 bp assembly padding on each side
    ft = _feature(features, "str", lo=150, length=600) \
        or _feature(features, "hp", lo=150, length=600)
    assert ft, "window planted no interior repeat"
    s, e = ft
    pos = (s + e) // 2
    alt = b"A" if ref[pos] != ord("A") else b"T"
    hap, _ = apply_variants(ref, [Variant(pos, bytes(ref[pos:pos + 1]),
                                          alt)])
    haps, _ = _haps(ref, _reads_from(ref) + _reads_from(hap, prefix="a"))
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps


@pytest.mark.parametrize("seed", SEEDS)
def test_str_unit_deletion_recovered(seed):
    """Deleting one STR unit — the canonical PCR-slippage-shaped indel the
    human fixtures exercise.  Haplotype BASES must match exactly (the
    alignment of an in-repeat deletion is ambiguous; bases are not)."""
    ref, features = repeat_rich_reference_with_features(620, seed=seed, feature_gap=(60, 160))
    ft = _feature(features, "str", length=620)
    if ft is None:
        pytest.skip("no interior STR at this seed")
    s, e = ft
    # delete e-s's first unit-length chunk anchored one base left
    unit = max(2, min(6, (e - s) // 4))
    v = Variant(s - 1, bytes(ref[s - 1:s + unit]), bytes(ref[s - 1:s]))
    hap, _ = apply_variants(ref, [v])
    haps, _ = _haps(ref, _reads_from(ref) + _reads_from(hap, prefix="d"))
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps


@pytest.mark.parametrize("seed", SEEDS)
def test_homopolymer_insertion_recovered(seed):
    """+1 base in a homopolymer run — the classic sequencing/assembly
    stress; the inserted base extends the run so every alignment of the
    event is equivalent."""
    ref, features = repeat_rich_reference_with_features(620, seed=seed, feature_gap=(60, 160))
    ft = _feature(features, "hp", length=620)
    if ft is None:
        pytest.skip("no interior homopolymer at this seed")
    s, e = ft
    v = Variant(s, bytes(ref[s:s + 1]), bytes(ref[s:s + 1]) * 2)
    hap, _ = apply_variants(ref, [v])
    haps, _ = _haps(ref, _reads_from(ref) + _reads_from(hap, prefix="i"))
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps


def test_long_str_run_assembles_via_kmer_retry():
    """A 78 bp dinucleotide run makes every k <= run-unit kmer non-unique:
    k=21/33 graphs reject and the assembler's retry schedule
    (read_threading_assembler.rs:419-450) must land a bigger odd k that
    spans the run."""
    rng = np.random.default_rng(7)
    ref = BASES[rng.integers(0, 4, 400)]
    unit = np.frombuffer(b"AC", np.uint8)
    ref[150:228] = np.tile(unit, 39)
    pos = 300
    alt = b"G" if ref[pos] != ord("G") else b"C"
    hap, _ = apply_variants(ref, [Variant(pos, bytes(ref[pos:pos + 1]),
                                          alt)])
    haps, out = _haps(ref, _reads_from(ref) + _reads_from(hap, prefix="s"))
    assert ref.tobytes() in haps
    assert hap.tobytes() in haps
    # the winning graphs really did need k > 33 to span the run (the ref
    # haplotype carries the k=0 placeholder; only assembled ones count)
    assert all(h.kmer_size > 33 for h in out if not h.is_ref)


@pytest.mark.parametrize("seed", SEEDS)
def test_dangling_tail_near_repeat_recovered(seed):
    """A SNP close to the window end inside/near a repeat: alt reads stop
    before re-anchoring, so the alt path dangles and must be recovered by
    the SW merge (abstract_read_threading_graph.rs:231-335)."""
    ref, features = repeat_rich_reference_with_features(520, seed=seed, feature_gap=(60, 160))
    ft = _feature(features, "str", lo=340, hi_margin=70, length=520) or \
        _feature(features, "hp", lo=340, hi_margin=70, length=520)
    if ft is None:
        pytest.skip("no late repeat at this seed")
    s, e = ft
    pos = min(e + 10, 505)
    alt = b"A" if ref[pos] != ord("A") else b"T"
    hap, _ = apply_variants(ref, [Variant(pos, bytes(ref[pos:pos + 1]),
                                          alt)])
    # alt reads end 30 bp after the SNP: no re-anchor to the ref sink
    reads = _reads_from(ref)
    alt_reads = []
    for k, st in enumerate(range(max(0, pos - 70), pos - 20, 5)):
        end = min(pos + 30, len(hap))
        bases = np.asarray(hap[st:end], np.uint8).copy()
        alt_reads.append(BamRecord(
            name=f"t{k}", flag=0, tid=0, pos=st, mapq=60,
            cigar=[("M", end - st)], seq=bases,
            qual=np.full(end - st, 30, np.uint8)))
    haps, _ = _haps(ref, reads + alt_reads,
                    recover_dangling_branches=True)
    assert ref.tobytes() in haps
    assert any(h != ref.tobytes() and bytes(hap[pos - 10:pos + 1]) in h
               for h in haps), "alt path near the repeat was not recovered"


def test_low_entropy_segment_does_not_fabricate_haplotypes():
    """Low-complexity tracts must not seed spurious haplotypes when reads
    are error-free."""
    for seed in SEEDS:
        ref, features = repeat_rich_reference_with_features(600, seed=seed, feature_gap=(60, 160))
        if _feature(features, "low", length=600) is None:
            continue
        haps, _ = _haps(ref, _reads_from(ref, stride=3))
        assert haps == {ref.tobytes()}
        return
    pytest.skip("no interior low-entropy segment in seed range")
