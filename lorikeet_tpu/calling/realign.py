"""Realign reads to their best haplotype.

Contract: /root/reference/src/assembly/assembly_based_caller_utils.rs:208-246
realign_reads_to_their_best_haplotype — each read is Smith-Waterman-aligned
(ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS, smith_waterman_aligner.rs:26)
to the haplotype with its best likelihood (ties prefer the reference
haplotype / simpler CIGAR, :297-305), and the read-vs-haplotype alignment
is composed through the haplotype-vs-reference CIGAR to produce the read's
new reference position and CIGAR (AlignmentUtils::create_read_aligned_to_ref
role).  The realigned copies replace the evidence reads so downstream
windows/annotations see haplotype-consistent coordinates.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

from lorikeet_tpu.ops.smith_waterman import (
    ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS, OverhangStrategy, align,
)


def _hap_base_maps(hap_cigar: list, hap_ref_start: int):
    """Per-haplotype-base (ref position | -1 for insertions) and the count
    of deleted ref bases immediately before each haplotype base.

    Memoized per (cigar, start): every read realigned to a haplotype shares
    its maps, so a region costs O(haplotypes) builds instead of O(reads)."""
    return _hap_base_maps_cached(
        tuple(map(tuple, hap_cigar)), hap_ref_start)


@functools.lru_cache(maxsize=1024)
def _hap_base_maps_cached(hap_cigar: tuple, hap_ref_start: int):
    ref_pos = []
    del_before = []
    pending_del = 0
    r = hap_ref_start
    for op, n in hap_cigar:
        if op in "M=X":
            for _ in range(n):
                ref_pos.append(r)
                del_before.append(pending_del)
                pending_del = 0
                r += 1
        elif op == "I":
            for _ in range(n):
                ref_pos.append(-1)
                del_before.append(pending_del)
                pending_del = 0
        elif op in "DN":
            pending_del += n
            r += n
        # S/H impossible for assembled haplotypes
    return np.asarray(ref_pos, np.int64), np.asarray(del_before, np.int64)


def compose_to_reference(read_vs_hap_cigar: list, read_offset_in_hap: int,
                         hap_cigar: list, hap_ref_start: int):
    """(new_ref_pos, read-vs-ref cigar) from a read-vs-haplotype alignment.

    Soft clips in the read-vs-hap alignment are preserved.
    """
    ref_pos, del_before = _hap_base_maps(hap_cigar, hap_ref_start)
    out = []

    def emit(op, n=1):
        if n <= 0:
            return
        if out and out[-1][0] == op:
            out[-1][1] += n
        else:
            out.append([op, n])

    h = read_offset_in_hap
    new_pos = None
    for op, n in read_vs_hap_cigar:
        if op in "M=X":
            for _ in range(n):
                if h >= len(ref_pos):
                    emit("S")          # ran off the haplotype: soft clip
                    continue
                emit("D", int(del_before[h]))
                if ref_pos[h] < 0:
                    emit("I")
                else:
                    if new_pos is None:
                        new_pos = int(ref_pos[h])
                    emit("M")
                h += 1
        elif op == "I":
            emit("I", n)
        elif op == "D":
            for _ in range(n):
                if h >= len(ref_pos):
                    break
                emit("D", int(del_before[h]))
                if ref_pos[h] >= 0:
                    emit("D")
                h += 1
        elif op == "S":
            emit("S", n)
        # H dropped
    # canonicalize: leading/trailing D removed, I+D merges left as-is
    cleaned = [(op, n) for op, n in out]
    while cleaned and cleaned[0][0] == "D":
        cleaned.pop(0)
    while cleaned and cleaned[-1][0] == "D":
        cleaned.pop()
    return new_pos, cleaned


def realign_reads_to_best_haplotype(likelihoods, haplotypes,
                                    window_start: int) -> int:
    """Replace each evidence read with a copy realigned via its best
    haplotype; returns the number of realigned reads.  `haplotypes` are
    AssembledHaplotypes whose cigars are vs the padded window at
    ``window_start``."""
    n = 0
    hap_maps = {}
    for s in likelihoods.samples:
        mat = likelihoods.values[s]            # [haps, reads]
        reads = likelihoods.reads_by_sample[s]
        if mat.shape[1] == 0:
            continue
        # ties prefer the reference haplotype then fewer cigar elements
        # (haplotype_alignment_tiebreaking_priority)
        priority = np.array([(1 if h.is_ref else 0) - (len(h.cigar) - 1)
                             for h in haplotypes], np.float64)
        best = np.argmax(mat + priority[:, None] * 1e-9, axis=0)
        for i, rec in enumerate(reads):
            hap = haplotypes[int(best[i])]
            if hap.is_ref:
                continue                        # already ref-aligned
            res = align(hap.bases, rec.seq.tobytes(),
                        ALIGNMENT_TO_BEST_HAPLOTYPE_SW_PARAMETERS,
                        OverhangStrategy.SOFTCLIP)
            if res is None:
                continue
            cigar, offset = res
            new_pos, new_cigar = compose_to_reference(
                cigar, offset, hap.cigar, window_start)
            if new_pos is None or not new_cigar:
                continue
            reads[i] = dataclasses.replace(rec, pos=new_pos, cigar=new_cigar)
            n += 1
    return n
