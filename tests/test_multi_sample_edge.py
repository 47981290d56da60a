"""Per-sample edge multiplicity semantics, ported from the reference suite
(tests/multi_sample_edge_unit_tests.rs: test_multiplicity /
make_multiplicity_data against src/graphs/multi_sample_edge.rs).

The pruning multiplicity of an edge over samples [c_0..c_{k-1}] plus the
current (empty) sample is the num_pruning_samples-th largest count of
{c_0..c_{k-1}, 0} — computed incrementally by keeping only the top
num_pruning_samples counts at each sample flush."""
import itertools

import pytest

from lorikeet_tpu.assembly.graph import Edge


def reference_prune(counts, num_samples_pruning):
    """The closed-form expectation from the Rust test (:60-63)."""
    c = sorted(list(counts) + [0])
    return c[max(len(c) - num_samples_pruning, 0)]


def run_multiplicity(counts_per_sample, nsp):
    edge = Edge(is_ref=False, num_pruning_samples=nsp)
    assert edge.multiplicity == 0
    assert edge.pruning_multiplicity(nsp) == 0
    total = 0
    for count in counts_per_sample:
        sample_count = 0
        for _ in range(count):
            edge.inc(1)
            total += 1
            sample_count += 1
            assert edge.multiplicity == total
            assert edge.current_sample == sample_count
        edge.flush_sample(nsp)
    assert edge.multiplicity == total
    assert edge.pruning_multiplicity(nsp) == \
        reference_prune(counts_per_sample, nsp)


@pytest.mark.parametrize("nsp", [1, 2, 3])
@pytest.mark.parametrize("n_samples", [1, 2, 3, 4, 5])
def test_multiplicity_permutations(nsp, n_samples):
    for perm in itertools.permutations([0, 1, 2, 3, 4, 5], n_samples):
        run_multiplicity(perm, nsp)
