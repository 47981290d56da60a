"""finalize_regions over the reference's exact overlapping-mate fixture
(tests/assembly_based_caller_utils_unit_tests.rs:34-75 test_finalize_region:
two real HiSeq mates that overlap WITHOUT agreement — their base qualities
must be modified by the overlapping-pair correction, and the clean-cigar
mate must still be copied rather than mutated in place)."""
import numpy as np

from lorikeet_tpu.calling.clipping import finalize_region_reads
from lorikeet_tpu.io.bam import BamRecord

READ1_SEQ = (b"GAATCATCATCAAATGGAATCTAATGGAATCATTGAACAGAATTGAATGGAATC"
             b"GTCATCGAATGAATTGAATGCAATCATCGAATGGTCTCGAATAGAAT")
READ1_QUAL = (b"DAAAEDCFCCGEEDDBEDDDGCCDEDECDDFDCEECCFEECDCEDBCDBDBCC>"
              b"DCECC>DBCDDBCBDDBCDDEBCCECC>DBCDBDBGC?FCCBDB>>?")
READ2_SEQ = (b"CTCGAATGGAATCATTTTCTACTGGAAAGGAATGGAATCATCGCATAGAATCGA"
             b"ATGGAATTAACATGGAATGGAATCGAATGTAATCATCATCAAATGGA")
READ2_QUAL = (b">@>:ABCDECCCEDCBBBDDBDDEBCCBEBBCBEBCBCDDCD>DECBGCDCF>C"
              b"CCFCDDCBABDEDFCDCDFFDDDG?DDEGDDFDHFEGDDGECB@BAA")


def _rec(name, flag, pos, cigar, seq, qual, mate_pos, tlen):
    return BamRecord(
        name=name, flag=flag, tid=0, pos=pos, mapq=39, cigar=cigar,
        seq=np.frombuffer(seq, np.uint8).copy(),
        qual=(np.frombuffer(qual, np.uint8) - 33).copy(),
        mate_tid=0, mate_pos=mate_pos, tlen=tlen)


def test_finalize_region_overlapping_mates_fixture():
    name = "HWI-ST807:461:C2P0JACXX:4:2204:18080:5857"
    # SAM positions are 1-based; flags 83/163 = proper pair, one reverse
    r1 = _rec(name, 83, 42596802, [("S", 1), ("M", 95), ("S", 5)],
              READ1_SEQ, READ1_QUAL, 42596890, -7)
    r2 = _rec(name, 163, 42596890, [("M", 101)],
              READ2_SEQ, READ2_QUAL, 42596802, 7)
    orig_q1 = r1.qual.copy()
    orig_q2 = r2.qual.copy()

    out = finalize_region_reads({0: [r1, r2]}, 42596728, 42598843,
                                min_base_quality=9,
                                correct_overlapping_quals=True)
    kept = out[0]
    assert len(kept) == 2
    f1, f2 = sorted(kept, key=lambda r: (r.pos, -len(r.seq)))
    # |tlen| = 7: adaptor read-through is hard-clipped to the fragment
    # (read_clipper.rs hard_clip_adaptor_sequence), leaving two fully
    # overlapping stubs at the fragment start
    assert f1.pos == f2.pos == 42596890
    assert len(f2.seq) == 7
    # the surviving overlap AGREES base-for-base, so quals are capped at
    # HALF_PCR_SNV_QUAL = 20 rather than zeroed (fragment_utils.rs:27-149)
    assert (f2.qual <= 20).all() and (f2.qual > 0).all()
    assert (f1.qual[:7] <= 20).all()
    # ...and were genuinely modified relative to the originals
    assert not np.array_equal(f2.qual, orig_q2[:7])
    # the clean-cigar mate was COPIED, not corrected in place (the
    # reference's regression: clipping skipped copying clean cigars)
    assert r2.qual is not f2.qual
    assert np.array_equal(r2.qual, orig_q2)
