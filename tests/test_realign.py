"""Realignment to best haplotype (assembly_based_caller_utils.rs:208-246)."""
import numpy as np

from lorikeet_tpu.calling.realign import compose_to_reference


def test_compose_match_through_snp_hap():
    # hap differs from ref by a SNP only: hap cigar 100M at window 0
    pos, cig = compose_to_reference([("M", 50)], 10, [("M", 100)], 1000)
    assert pos == 1010 and cig == [("M", 50)]


def test_compose_through_hap_insertion():
    # hap = 40M 3I 57M vs ref; read spans the insertion
    hap_cigar = [("M", 40), ("I", 3), ("M", 57)]
    pos, cig = compose_to_reference([("M", 30)], 30, hap_cigar, 500)
    # read covers hap bases 30..60: 10M on ref, 3 inserted, 17M
    assert pos == 530
    assert cig == [("M", 10), ("I", 3), ("M", 17)]


def test_compose_through_hap_deletion():
    # hap = 40M 5D 60M; read crosses the deletion
    hap_cigar = [("M", 40), ("D", 5), ("M", 60)]
    pos, cig = compose_to_reference([("M", 30)], 25, hap_cigar, 0)
    assert pos == 25
    assert cig == [("M", 15), ("D", 5), ("M", 15)]


def test_compose_read_insertion_and_softclip_becomes_insertion():
    # read-vs-hap soft clips compose as insertions vs the reference
    # (alignment_utils.rs:988-1015 CigarPairTransform S->I)
    pos, cig = compose_to_reference(
        [("S", 4), ("M", 10), ("I", 2), ("M", 10)], 5, [("M", 100)], 0)
    assert pos == 5
    assert cig == [("I", 4), ("M", 10), ("I", 2), ("M", 10)]


def test_realign_moves_reads_spanning_deletion():
    """A read simulated from a deletion haplotype gets a D in its CIGAR
    after realignment through the chosen haplotype."""
    from lorikeet_tpu.calling.likelihoods import AlleleLikelihoods
    from lorikeet_tpu.calling.realign import realign_reads_to_best_haplotype
    from lorikeet_tpu.assembly.graph import AssembledHaplotype
    from lorikeet_tpu.io.bam import BamRecord

    rng = np.random.default_rng(0)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), 200)
    ref_b = ref.tobytes()
    hap_del = ref_b[:100] + ref_b[110:]        # 10bp deletion at 100
    haps = [
        AssembledHaplotype(ref_b, [("M", 200)], 0.0, True, 21),
        AssembledHaplotype(hap_del, [("M", 100), ("D", 10), ("M", 90)],
                           -1.0, False, 21),
    ]
    # read = 60bp of the deletion haplotype crossing the junction
    read_seq = np.frombuffer(hap_del[70:130], np.uint8)
    rec = BamRecord(name="r", flag=0, tid=0, pos=1070, mapq=60,
                    cigar=[("M", 60)], seq=read_seq.copy(),
                    qual=np.full(60, 30, np.uint8))
    lks = AlleleLikelihoods(haps, {0: [rec]})
    lks.values[0][0, 0] = -50.0                # ref poor
    lks.values[0][1, 0] = -1.0                 # deletion hap good
    n = realign_reads_to_best_haplotype(lks, haps, window_start=1000)
    assert n == 1
    new = lks.reads_by_sample[0][0]
    assert new.pos == 1070
    assert new.cigar == [("M", 30), ("D", 10), ("M", 30)]


def test_pure_match_fast_path_equals_general():
    """The pure-M fast path in compose_to_reference (fires only when the
    pre-padded hap cigar is passed) must equal the general builder path
    (which runs when padded_hap_cigar is None) over random hap cigars and
    offsets."""
    import numpy as np

    from lorikeet_tpu.calling.realign import (
        _padded_hap_cigar, compose_to_reference,
    )

    rng = np.random.default_rng(11)
    ops = ["I", "D"]
    for trial in range(200):
        hap_cigar = [("M", int(rng.integers(5, 40)))]
        for _ in range(int(rng.integers(0, 4))):
            hap_cigar.append((ops[int(rng.integers(0, 2))],
                              int(rng.integers(1, 5))))
            hap_cigar.append(("M", int(rng.integers(5, 40))))
        hap_len = sum(n for op, n in hap_cigar if op in "MI")
        n = int(rng.integers(3, max(4, hap_len)))
        if n >= hap_len:
            n = hap_len - 1
        offset = int(rng.integers(0, hap_len - n))
        sw = [("M", n)]
        padded = _padded_hap_cigar(hap_cigar)
        fast = compose_to_reference(sw, offset, hap_cigar, 1000,
                                    padded_hap_cigar=padded)
        general = compose_to_reference(sw, offset, hap_cigar, 1000)
        assert fast == general, (trial, hap_cigar, offset, n)
