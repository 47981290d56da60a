"""Alignment-utils conformance: indel left-alignment and cigar trimming.

Vectors ported from /root/reference/tests/alignment_utils_unit_tests.rs
(make_left_align_indel_data, make_trim_cigar_data,
make_trim_cigar_by_bases_data).
"""
import itertools

import numpy as np
import pytest

from lorikeet_tpu.utils.cigar import (
    left_align_indels, trim_cigar_by_bases, trim_cigar_by_reference,
)


def parse(s):
    out = []
    n = 0
    for ch in s:
        if ch.isdigit():
            n = n * 10 + int(ch)
        else:
            out.append((ch, n))
            n = 0
    return out


def unparse(cigar):
    return "".join(f"{n}{op}" for op, n in cigar)


@pytest.mark.parametrize("ref,read,original,expected", [
    # nothing happens when there is no indel
    ("ACGT", "ACGT", "4M", "4M"),
    ("ACCT", "ACGT", "4M", "4M"),
    ("ACGT", "ACAT", "2M1X1M", "2M1X1M"),
    # one insertion already left-aligned
    ("AAATTT", "AAACCCTTT", "3M3I3M", "3M3I3M"),
    ("CCCTTT", "AAACCCTTT", "3I6M", "3I6M"),
    ("AAACCC", "AAACCCTTT", "6M3I", "6M3I"),
    ("AAACCC", "AAACCGTTT", "6M3I", "6M3I"),
    # one deletion already left-aligned
    ("AAACCCTTT", "AAATTT", "3M3D3M", "3M3D3M"),
    # insertion not left-aligned in homopolymer / STR
    ("AAACCCTTT", "AAACCCCCCTTT", "5M3I4M", "3M3I6M"),
    ("AAACCCTTT", "AAACCCCCCTTT", "6M3I3M", "3M3I6M"),
    ("AAACCCTTT", "AAGCCCCCCTGT", "6M3I3M", "3M3I6M"),
    ("AAACGCGCGCGTTT", "AAACGCGCGCGCGCGTTT", "7M4I7M", "3M4I11M"),
    ("CCGCCG", "CCGCCGCCG", "6M3I", "3I6M"),
    ("ACCGCCG", "TCCGCCGCCG", "7M3I", "1M3I6M"),
    # deletion not left-aligned in homopolymer / STR
    ("AAACCCCCCTTT", "AAACCCTTT", "5M3D4M", "3M3D6M"),
    ("AAACCCCCCTTT", "AAACCCTTT", "6M3D3M", "3M3D6M"),
    ("AAACGCGCGCGCGCGTTT", "AAACGCGCGCGTTT", "7M4D7M", "3M4D11M"),
    # multiple separated indels
    ("AAACCCTTTGGGAAA", "AAACCCCCCTTTGGGGGGAAA", "6M3I6M3I3M",
     "3M3I6M3I6M"),
    ("AAACCCTTTGGGGGGAAA", "AAACCCCCCTTTGGGAAA", "6M3I6M3D3M",
     "3M3I6M3D6M"),
    # indels in the same STR that combine or cancel
    ("AAACCCCCTTT", "AAACCCCCTTT", "4M3I3D4M", "11M"),
    ("AAACCCCCTTT", "AAACCCCCTTT", "4M3D3I4M", "11M"),
    ("AAACCCCCTTT", "AAACCCCCTTT", "3M3I2M3D3M", "11M"),
    ("AACGCGCGCGTT", "AACGCGCGCGCGCGTT", "2M2I8M2I2M", "2M4I10M"),
    ("AACGCGCGCGCGCGTT", "AACGCGCGCGTT", "2M2D8M2D2M", "2M4D10M"),
])
def test_left_align_indel(ref, read, original, expected):
    out, lead, trail = left_align_indels(
        parse(original),
        np.frombuffer(ref.encode(), np.uint8),
        np.frombuffer(read.encode(), np.uint8))
    assert unparse(out) == expected
    assert lead == 0 and trail == 0


def _trim_ref_cases():
    cases = []
    # generated grid (make_trim_cigar_data): single-op cores with D/M pads
    for op in "D=XM":
        for my_length in range(1, 6):
            for start in range(my_length - 1):
                for end in range(start, my_length):
                    length = end - start + 1
                    for pad_op in "DM":
                        for left_pad in range(2):
                            for right_pad in range(2):
                                s = ""
                                if left_pad:
                                    s += f"{left_pad}{pad_op}"
                                s += f"{my_length}{op}"
                                if right_pad:
                                    s += f"{right_pad}{pad_op}"
                                cases.append((s, start + left_pad,
                                              end + left_pad,
                                              f"{length}{op}"))
    # insertion cores with M pads
    for left_pad in (0, 1, 2, 5):
        for right_pad in (0, 1, 2, 5):
            if left_pad + right_pad == 0:
                continue
            for ins_size in (1, 10):
                for start in range(left_pad + 1):
                    for stop in range(left_pad, left_pad + right_pad):
                        lp = left_pad - start
                        rp = stop - left_pad + 1
                        s = f"{left_pad}M{ins_size}I{right_pad}M"
                        exp = (f"{lp}M" if lp else "") + f"{ins_size}I" \
                            + (f"{rp}M" if rp else "")
                        cases.append((s, start, stop, exp))
    # explicit rows
    cases += [
        ("3M2D4M", 0, 8, "3M2D4M"), ("3M2D4M", 2, 8, "1M2D4M"),
        ("3M2D4M", 2, 6, "1M2D2M"), ("3M2D4M", 3, 6, "2D2M"),
        ("3M2D4M", 4, 6, "1D2M"), ("3M2D4M", 5, 6, "2M"),
        ("3M2D4M", 6, 6, "1M"),
        ("2M3I4M", 0, 5, "2M3I4M"), ("2M3I4M", 1, 5, "1M3I4M"),
        ("2M3I4M", 1, 4, "1M3I3M"), ("2M3I4M", 2, 4, "3I3M"),
        ("2M3I4M", 2, 3, "3I2M"), ("2M3I4M", 2, 2, "3I1M"),
        ("2M3I4M", 3, 4, "2M"), ("2M3I4M", 3, 3, "1M"),
        ("2M3I4M", 4, 4, "1M"),
    ]
    return cases


def test_trim_cigar_by_reference():
    for cig, start, end, expected in _trim_ref_cases():
        # all-deletion results are invalid by construction
        # (reference skips them, alignment_utils_unit_tests.rs:672-681)
        exp = parse(expected)
        if len(exp) == 1 and exp[0][0] == "D":
            continue
        out, lead, trail = trim_cigar_by_reference(parse(cig), start, end)
        # builder normalization: leading/trailing deletions removed
        want = list(exp)
        while want and want[0][0] == "D":
            want.pop(0)
        while want and want[-1][0] == "D":
            want.pop()
        assert out == want, (cig, start, end, expected, out)


@pytest.mark.parametrize("cig,start,end,expected", [
    ("2M3I4M", 0, 8, "2M3I4M"), ("2M3I4M", 1, 8, "1M3I4M"),
    ("2M3I4M", 2, 8, "3I4M"), ("2M3I4M", 3, 8, "2I4M"),
    ("2M3I4M", 4, 8, "1I4M"), ("2M3I4M", 4, 7, "1I3M"),
    ("2M3I4M", 4, 6, "1I2M"), ("2M3I4M", 4, 5, "1I1M"),
    ("2M3I4M", 4, 4, "1I"), ("2M3I4M", 5, 5, "1M"),
    ("2M2D2I", 0, 3, "2M2I"), ("2M2D2I", 1, 3, "1M2I"),
    ("2M2D2I", 2, 3, "2I"), ("2M2D2I", 3, 3, "1I"),
    ("2M2D2I", 2, 2, "1I"), ("2M2D2I", 1, 2, "1M1I"),
    ("2M2D2I", 0, 1, "2M"), ("2M2D2I", 1, 1, "1M"),
])
def test_trim_cigar_by_bases(cig, start, end, expected):
    out, _, _ = trim_cigar_by_bases(parse(cig), start, end)
    assert unparse(out) == expected
