"""CIGAR algebra helpers.

Compact equivalents of the reference's cigar machinery
(/root/reference/src/reads/cigar_utils.rs, cigar_builder.rs,
alignment_utils.rs): consumption accounting, trimming to a base window,
indel left-alignment, and the haplotype-vs-reference CIGAR recipe.
CIGARs are lists of (op_char, length).
"""
from __future__ import annotations

import numpy as np

CONSUMES_READ = set("MIS=X")
CONSUMES_REF = set("MDN=X")


def read_length(cigar) -> int:
    return sum(n for op, n in cigar if op in CONSUMES_READ)


def reference_length(cigar) -> int:
    return sum(n for op, n in cigar if op in CONSUMES_REF)


def read_offset_at(pos: int, read_pos: int, cigar) -> int | None:
    """Read-base index aligned at genomic `pos`, or None if the position
    falls in a deletion/skip or outside the alignment
    (read_utils.rs get_read_base_quality_at_reference_coordinate role)."""
    ref = read_pos
    off = 0
    for op, n in cigar:
        if op in ("M", "=", "X"):
            if ref <= pos < ref + n:
                return off + (pos - ref)
            ref += n
            off += n
        elif op in ("I", "S"):
            off += n
        elif op in ("D", "N"):
            if ref <= pos < ref + n:
                return None
            ref += n
        # H/P consume nothing
    return None


def merge_adjacent(cigar):
    out = []
    for op, n in cigar:
        if n == 0:
            continue
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + n)
        else:
            out.append((op, n))
    return out


class CigarBuilderError(ValueError):
    pass


class CigarBuilder:
    """Validating, normalizing CIGAR accumulator
    (/root/reference/src/reads/cigar_builder.rs).

    ``make()`` merges adjacent same-type elements, normalizes mixed
    insertion/deletion runs to deletion-then-insertion, optionally strips
    deletions with no aligned bases before/after them (counting the removed
    bases), and validates clip placement (leading H then S, trailing S then
    H, no clips mid-read, at least one read-consuming non-clip element).
    ``make()`` may be called repeatedly as elements accumulate; counters
    are recomputed over the full element list each time."""

    def __init__(self, remove_deletions: bool = True):
        self.remove_deletions = remove_deletions
        self.elements = []      # raw (op, len) in added order
        self.leading_deletion_bases_removed = 0
        self.trailing_deletion_bases_removed = 0

    def add(self, op: str, n: int) -> "CigarBuilder":
        if n < 0:
            raise CigarBuilderError(f"negative length {n}{op}")
        if op not in "MIDNSHP=X":
            raise CigarBuilderError(f"unknown op {op!r}")
        if n:
            self.elements.append((op, n))
        return self

    def _validate(self, elements):
        # clips only at the ends, H outside S
        n = len(elements)
        i = 0
        while i < n and elements[i][0] == "H":
            i += 1
        while i < n and elements[i][0] == "S":
            i += 1
        j = n
        while j > i and elements[j - 1][0] == "H":
            j -= 1
        while j > i and elements[j - 1][0] == "S":
            j -= 1
        core = elements[i:j]
        if any(op in "SH" for op, _ in core):
            raise CigarBuilderError(f"clips inside the read: {elements}")
        if not any(op in "MI=X" for op, _ in core):
            raise CigarBuilderError(f"fully clipped cigar: {elements}")

    def make(self):
        """Normalized [(op, len)]; raises CigarBuilderError when invalid."""
        elements = merge_adjacent(self.elements)
        # normalize maximal I/D runs to one D then one I
        # (cigar_builder.rs indel-sandwich handling)
        out = []
        i = 0
        while i < len(elements):
            op, n = elements[i]
            if op in "ID":
                d_tot = ins_tot = 0
                while i < len(elements) and elements[i][0] in "ID":
                    if elements[i][0] == "D":
                        d_tot += elements[i][1]
                    else:
                        ins_tot += elements[i][1]
                    i += 1
                if d_tot:
                    out.append(("D", d_tot))
                if ins_tot:
                    out.append(("I", ins_tot))
            else:
                out.append((op, n))
                i += 1
        leading_removed = trailing_removed = 0
        if self.remove_deletions:
            # a deletion with no aligned (M/=/X) bases before (after) it is
            # a leading (trailing) deletion and is dropped; insertions do
            # not anchor a deletion
            kept = []
            aligned_seen = 0
            aligned_total = sum(1 for op, _ in out if op in "M=X")
            for op, n in out:
                if op in "M=X":
                    aligned_seen += 1
                    kept.append((op, n))
                elif op == "D":
                    if aligned_seen == 0:
                        leading_removed += n
                    elif aligned_seen == aligned_total:
                        trailing_removed += n
                    else:
                        kept.append((op, n))
                else:
                    kept.append((op, n))
            out = merge_adjacent(kept)
        self.leading_deletion_bases_removed = leading_removed
        self.trailing_deletion_bases_removed = trailing_removed
        self._validate(out)
        return out


def clip_cigar(cigar, start: int, stop: int, clip_op: str = "S"):
    """Replace query positions [start, stop) with clip elements
    (cigar_utils.rs:149-230 clip_cigar).  Positions count soft-clipped and
    aligned read bases; hard clips pass through.  Deletions at the clip
    boundary or inside the clipped span are dropped (via CigarBuilder's
    leading/trailing deletion removal)."""
    builder = CigarBuilder(remove_deletions=True)
    pos = 0
    for op, n in cigar:
        if op == "H":
            builder.add("H", n)
            continue
        consumes = op in CONSUMES_READ
        end = pos + (n if consumes else 0)
        if end <= start or pos >= stop:
            # outside the clip; deletions exactly at the boundary are
            # meaningless and skipped (cigar_utils.rs:180-186)
            if consumes or (pos != start and pos != stop):
                builder.add(op, n)
        else:
            if not consumes:
                pos = end
                continue   # D/N inside the clipped span vanish
            lo = max(pos, start)
            hi = min(end, stop)
            if pos < lo:
                builder.add(op, lo - pos)
            kept_clip = "S" if (op == "S" and clip_op == "S") else clip_op
            builder.add(kept_clip, hi - lo)
            if end > hi:
                builder.add(op, end - hi)
        pos = end
    return builder.make()


def alignment_start_shift(cigar, num_clipped: int) -> int:
    """Reference bases skipped when hard-clipping the first ``num_clipped``
    query bases (cigar_utils.rs:281-330)."""
    ref_clipped = 0
    pos = 0
    for op, n in cigar:
        if op == "H":
            continue
        end = pos + (n if op in CONSUMES_READ else 0)
        if end <= num_clipped:
            if op in CONSUMES_REF:
                ref_clipped += n
        elif pos < num_clipped:
            if op in CONSUMES_REF:
                ref_clipped += num_clipped - pos
            break
        else:
            break
        pos = end
    return ref_clipped


def trim_cigar_by_bases(cigar, start: int, end: int):
    """Keep the cigar portion covering READ bases [start, end] inclusive.

    Returns (cigar, leading_deletion_bases_removed, trailing_deletion_bases_removed)
    mirroring AlignmentUtils::trim_cigar_by_bases semantics: deletions at the
    cut points are dropped and reported.
    """
    out = []
    pos = 0  # read-base cursor
    lead_del = trail_del = 0
    for op, n in cigar:
        consumes = op in CONSUMES_READ
        if not consumes:
            # deletion-like: keep only if strictly inside the kept window
            if pos > start and pos <= end:
                out.append((op, n))
            elif pos <= start and op == "D":
                lead_del += n
            elif pos > end and op == "D":
                trail_del += n
            continue
        seg_start = pos
        seg_end = pos + n  # exclusive
        pos = seg_end
        lo = max(seg_start, start)
        hi = min(seg_end, end + 1)
        if lo < hi:
            out.append((op, hi - lo))
    # a deletion attached to the very end counts as trailing
    while out and out[-1][0] == "D":
        trail_del += out.pop()[1]
    while out and out[0][0] == "D":
        lead_del += out.pop(0)[1]
    return merge_adjacent(out), lead_del, trail_del


def left_align_indels(cigar, ref: np.ndarray, read: np.ndarray, ref_offset: int = 0):
    """Shift indels as far left as possible (VCF normalization).

    Simplified but behavior-compatible version of
    alignment_utils.rs left_align_indels for the haplotype-cigar use case:
    repeatedly move each indel left one unit while the flanking bases allow.
    Returns the adjusted cigar (leading/trailing deletions preserved).
    """
    cigar = merge_adjacent(cigar)
    changed = True
    while changed:
        changed = False
        # positions of ops
        ref_pos = ref_offset
        read_pos = 0
        spans = []
        for op, n in cigar:
            spans.append((op, n, ref_pos, read_pos))
            if op in CONSUMES_REF:
                ref_pos += n
            if op in CONSUMES_READ:
                read_pos += n
        for k, (op, n, rpos, qpos) in enumerate(spans):
            if op not in "ID" or k == 0:
                continue
            prev_op, prev_n, _, _ = spans[k - 1]
            if prev_op != "M" or prev_n == 0:
                continue
            # unit = the indel sequence
            if op == "D":
                seg = ref[rpos:rpos + n]
                left = ref[rpos - 1] if rpos - 1 >= 0 else None
            else:
                seg = read[qpos:qpos + n]
                left = read[qpos - 1] if qpos - 1 >= 0 else None
            if left is None or seg.size == 0:
                continue
            if seg[-1] == left:
                # shift indel one base left
                new = list(cigar)
                new[k - 1] = (prev_op, prev_n - 1)
                if k + 1 < len(new) and new[k + 1][0] == "M":
                    new[k + 1] = ("M", new[k + 1][1] + 1)
                else:
                    new.insert(k + 1, ("M", 1))
                cigar = merge_adjacent(new)
                changed = True
                break
    return cigar


def calculate_cigar(ref_seq: np.ndarray, alt_seq: np.ndarray,
                    strategy=None, params=None):
    """Haplotype-vs-reference CIGAR (cigar_utils.rs:358-457): trivial cases,
    then N-padded SW + pad trimming + indel left-alignment."""
    from lorikeet_tpu.ops.smith_waterman import (
        align, NEW_SW_PARAMETERS, OverhangStrategy)
    if params is None:
        params = NEW_SW_PARAMETERS
    if strategy is None:
        strategy = OverhangStrategy.SOFTCLIP
    ref_seq = np.asarray(ref_seq, np.uint8)
    alt_seq = np.asarray(alt_seq, np.uint8)
    if alt_seq.size == 0:
        return [("D", int(ref_seq.size))]
    if alt_seq.size == ref_seq.size:
        mismatches = int(np.count_nonzero(alt_seq != ref_seq))
        if mismatches <= 2:
            return [("M", int(ref_seq.size))]
    pad = np.full(10, ord("N"), np.uint8)
    padded_ref = np.concatenate([pad, ref_seq, pad])
    padded_alt = np.concatenate([pad, alt_seq, pad])
    cigar, offset = align(padded_ref, padded_alt, params, strategy)
    if offset != 0 or any(op == "S" for op, _ in cigar):
        return None  # SW failure (is_s_w_failure)
    trimmed, lead_del, trail_del = trim_cigar_by_bases(
        cigar, 10, len(padded_alt) - 11)
    if trail_del > 0:
        trimmed = trimmed + [("D", trail_del)]
        trail_del = 0
    aligned = left_align_indels(trimmed, ref_seq, alt_seq, lead_del)
    out = []
    if lead_del > 0:
        out.append(("D", lead_del))
    out.extend(aligned)
    return merge_adjacent(out)
