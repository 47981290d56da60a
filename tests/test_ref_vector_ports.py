"""Round-4 ported reference vectors (SURVEY §4 audit):

- find_number_of_repetitions{,_full_array}
  (tests/variant_context_utils_unit_tests.rs:23-264)
- AlleleLikelihoods filter-poorly-modeled bookkeeping
  (tests/allele_likelihoods_unit_tests.rs:399-449)
- retain-evidence overlap window column compaction
  (tests/allele_likelihoods_unit_tests.rs:450-488)
"""
import numpy as np

from lorikeet_tpu.calling.likelihoods import AlleleLikelihoods
from lorikeet_tpu.utils.repeats import find_number_of_repetitions


def test_find_number_of_repetitions_vectors():
    # variant_context_utils_unit_tests.rs:23-152, every case
    assert find_number_of_repetitions(b"AT", b"GATAT", False) == 2
    assert find_number_of_repetitions(b"AT", b"GATAT", True) == 0
    assert find_number_of_repetitions(b"A", b"ATATG", True) == 1
    assert find_number_of_repetitions(b"AT", b"ATATG", True) == 2
    assert find_number_of_repetitions(b"CCC", b"CCCCCCCC", True) == 2
    assert find_number_of_repetitions(b"CCC", b"CCCCCCCC", False) == 2
    assert find_number_of_repetitions(b"ATG", b"ATGATGATGATG", True) == 4
    assert find_number_of_repetitions(b"G", b"ATGATGATGATG", True) == 0
    assert find_number_of_repetitions(b"T", b"T", True) == 1
    assert find_number_of_repetitions(b"AT", b"ATGATGATCATG", True) == 1
    assert find_number_of_repetitions(b"CCCCCCCC", b"CCC", True) == 0
    assert find_number_of_repetitions(b"AT", b"AT", True) == 1
    assert find_number_of_repetitions(b"AT", b"", True) == 0
    assert find_number_of_repetitions(b"ATG", b"ATGATGATGATG", False) == 4
    assert find_number_of_repetitions(b"G", b"ATGATGATGATG", False) == 1
    assert find_number_of_repetitions(b"T", b"T", False) == 1
    assert find_number_of_repetitions(b"AT", b"ATGATGATCATG", False) == 0
    assert find_number_of_repetitions(b"CCCCCCCC", b"CCC", False) == 0
    assert find_number_of_repetitions(b"AT", b"AT", False) == 1
    assert find_number_of_repetitions(b"AT", b"", False) == 0


def test_find_number_of_repetitions_full_array_vectors():
    # the offset/length variant (:154-264) maps to python slicing
    def main(unit, uo, ul, s, so, sl, leading):
        return find_number_of_repetitions(unit[uo:uo + ul], s[so:so + sl],
                                          leading)

    assert main(b"XXXATG", 3, 3, b"ATGATGATGATGYYY", 0, 12, True) == 4
    assert main(b"GGGG", 0, 1, b"GGGGATGATGATGATG", 4, 12, True) == 0
    assert main(b"T", 0, 1, b"TTTTT", 0, 1, True) == 1
    assert main(b"AT", 0, 2, b"AT", 0, 0, True) == 0
    assert main(b"AT", 0, 2, b"AT", 1, 0, True) == 0
    assert main(b"AT", 0, 2, b"", 0, 0, True) == 0
    assert main(b"XXXAT", 3, 2, b"XXXGATAT", 4, 4, False) == 2
    assert main(b"AT", 0, 2, b"GATAT", 0, 5, False) == 2


class _Read:
    """Minimal evidence stand-in (pos/end/len drive the API under test)."""

    def __init__(self, idx, pos=100, length=10):
        self.idx = idx
        self.pos = pos
        self.qual = np.full(length, 30, np.uint8)
        self.hmm_quals = self.qual
        self._len = length

    @property
    def reference_end(self):
        return self.pos + self._len

    def __len__(self):
        return self._len


def _good_and_bad(n_alleles=3, n_reads=8, good=lambda r: r % 2 == 0):
    """make_good_and_bad_likelihoods (allele_likelihoods_unit_tests.rs):
    'good' reads get a dominant likelihood, 'bad' reads are poorly modeled
    under every allele."""
    reads = [_Read(r) for r in range(n_reads)]
    lk = AlleleLikelihoods(list(range(n_alleles)), {0: reads})
    mat = lk.values[0]
    for r in range(n_reads):
        if good(r):
            mat[:, r] = -10.0
            mat[r % n_alleles, r] = -0.01
        else:
            mat[:, r] = -10000.0
    return lk, reads


def test_filter_poorly_modeled_bookkeeping():
    """:399-449 — odd (bad) reads drop, matrices compact to the surviving
    columns in order, and the filtered pool holds exactly the dropped
    reads."""
    lk, reads = _good_and_bad()
    before = lk.values[0].copy()
    lk.filter_poorly_modeled_evidence(dynamic=False)
    kept = lk.reads_by_sample[0]
    assert len(kept) == (len(reads) + 1) // 2
    assert len(kept) + len(lk.filtered_reads[0]) == len(reads)
    for r, rec in enumerate(kept):
        assert rec.idx == r * 2                     # original order, evens
        assert np.array_equal(lk.values[0][:, r], before[:, rec.idx])
    assert all(rec.idx % 2 == 1 for rec in lk.filtered_reads[0])


def test_retain_evidence_overlap_columns():
    """:450-488 — retain evidence overlapping a window; surviving columns
    are the original columns of the surviving reads, in order."""
    # even reads overlap position 1000, odd reads don't
    reads = [_Read(r, pos=1000 if r % 2 == 0 else 5000) for r in range(10)]
    lk = AlleleLikelihoods([0, 1], {0: reads})
    rng = np.random.default_rng(3)
    lk.values[0][:] = -rng.random((2, 10))
    before = lk.values[0].copy()
    lk.retain_evidence(lambda rec: rec.pos <= 1000 < rec.reference_end)
    kept = lk.reads_by_sample[0]
    assert [rec.idx for rec in kept] == [0, 2, 4, 6, 8]
    for r, rec in enumerate(kept):
        assert np.array_equal(lk.values[0][:, r], before[:, rec.idx])
