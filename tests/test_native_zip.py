"""Conformance: the in-C++ seq-graph zip (graph_build3 try_zip) must equal
the Python path (remove_paths_not_connected_to_ref + from_kmer_graph) —
same vertex sequences, same edges, same downstream haplotypes."""
import numpy as np
import pytest

from lorikeet_tpu.assembly.graph import ReadThreadingGraph, assemble_region
from lorikeet_tpu.assembly.seq_graph import SeqGraph
from lorikeet_tpu.native.graph_native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native graph builder unavailable")


def _random_pending(rng, ref_len=300, n_reads=60, err=0.01, k=15):
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, ref_len)]
    # plant a SNP so there is real variation
    alt = ref.copy()
    p = ref_len // 2
    alt[p] = bases[(int(np.where(bases == alt[p])[0][0]) + 1) % 4]
    pending = [("ref", ref.tobytes(), 1, True, 0)]
    for i in range(n_reads):
        src = alt if i % 2 else ref
        lo = int(rng.integers(0, ref_len - 80))
        read = src[lo:lo + 80].copy()
        m = rng.random(80) < err
        read[m] = bases[rng.integers(0, 4, int(m.sum()))]
        pending.append((f"r{i}", read.tobytes(), 1, False, i % 2))
    return pending


def _seq_graph_python(pending, k, prune):
    g = ReadThreadingGraph(k, 2, start_only_at_existing=False)
    g.pending = list(pending)
    g.build(prune_factor=prune, allow_zip=False)
    if g.cycle_checked:
        return None, g
    g.remove_paths_not_connected_to_ref()
    return SeqGraph.from_kmer_graph(g), g


def _seq_graph_zip(pending, k, prune, recovery_on=True):
    g = ReadThreadingGraph(k, 2, start_only_at_existing=False)
    g.pending = list(pending)
    g.build(prune_factor=prune, allow_zip=True, recovery_on=recovery_on)
    if g.native_zip is None:
        return None, g
    return SeqGraph.from_native_zip(*g.native_zip), g


def _canon(sg):
    edges = sorted((sg.seqs[u], sg.seqs[v], e.multiplicity, e.is_ref)
                   for u in sg.out_edges
                   for v, e in sg.out_edges[u].items())
    return sorted(sg.seqs.values()), edges


@pytest.mark.parametrize("seed", range(10))
def test_zip_equals_python_seq_graph(seed):
    rng = np.random.default_rng(seed)
    pending = _random_pending(rng)
    zipped = 0
    for k in (15, 21):
        for prune in (0, 2):
            sz, gz = _seq_graph_zip(pending, k, prune)
            if sz is None:
                # zip declined (dangling ends present) — the python path is
                # the production fallback, nothing to compare
                continue
            zipped += 1
            sp, gp = _seq_graph_python(pending, k, prune)
            assert sp is not None
            assert _canon(sz) == _canon(sp), (seed, k, prune)
            # same vertex/edge ORDER too (simplify iterates dicts)
            assert list(sz.seqs.values()) == list(sp.seqs.values())
            assert [(u, sorted(d)) for u, d in sorted(sz.out_edges.items())] \
                == [(u, sorted(d)) for u, d in sorted(sp.out_edges.items())]
    assert zipped > 0          # the fast path must engage somewhere


@pytest.mark.parametrize("seed", range(6))
def test_assemble_region_identical_with_and_without_zip(seed, monkeypatch):
    rng = np.random.default_rng(100 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, 400)]
    from lorikeet_tpu.io.bam import BamRecord
    reads = []
    for i in range(50):
        lo = int(rng.integers(0, 300))
        seq = ref[lo:lo + 90].copy()
        if i % 2:
            j = 200 - lo
            if 0 <= j < 90:
                seq[j] = bases[(int(np.where(bases == seq[j])[0][0]) + 2) % 4]
        m = rng.random(90) < 0.01
        seq[m] = bases[rng.integers(0, 4, int(m.sum()))]
        reads.append(BamRecord(f"r{i}", 0, 0, lo, 40, [("M", 90)], seq,
                               np.full(90, 35, np.uint8)))
    by_sample = {0: reads}

    def run():
        haps = assemble_region(ref, by_sample, kmer_sizes=(21, 33))
        return [(h.bases, tuple(h.cigar), round(h.score, 9), h.is_ref)
                for h in haps]

    with_zip = run()
    orig_build = ReadThreadingGraph.build

    def no_zip_build(self, *a, **kw):
        kw["allow_zip"] = False
        return orig_build(self, *a, **kw)

    monkeypatch.setattr(ReadThreadingGraph, "build", no_zip_build)
    without_zip = run()
    assert with_zip == without_zip


def test_zip_declines_on_dangling_ends():
    """A read with a divergent tail (unrecoverable kmers) must force the
    kmer-graph fallback when recovery is on, and zip when it is off."""
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, 200)].tobytes()
    tail = bytes(bases[rng.integers(0, 4, 30)])
    read = ref[100:160] + tail          # dangling tail branch
    pending = [("ref", ref, 1, True, 0), ("r0", read, 5, False, 0),
               ("r1", read, 5, False, 0)]
    sz, g = _seq_graph_zip(pending, 15, 0, recovery_on=True)
    assert sz is None and g.native_zip is None
    sz2, g2 = _seq_graph_zip(pending, 15, 0, recovery_on=False)
    assert sz2 is not None
