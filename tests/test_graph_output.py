"""--graph-output DOT dumps (base_graph.rs:505) and filter knobs
(qual-by-depth-filter / depth-per-sample-filter wiring)."""
import numpy as np

from lorikeet_tpu.assembly.graph import assemble_region
from lorikeet_tpu.assembly.seq_graph import SeqGraph


class _Read:
    _n = 0

    def __init__(self, seq, qual):
        self.seq = seq
        self.qual = qual
        self.cigar = [("M", len(seq))]
        _Read._n += 1
        self.name = f"r{_Read._n}"


def test_seq_graph_to_dot():
    sg = SeqGraph()
    a = sg.add_vertex(b"ACGT")
    b = sg.add_vertex(b"T")
    sg.add_edge(a, b, 3, is_ref=True)
    dot = sg.to_dot("g1")
    assert dot.startswith('digraph "g1"')
    assert 'label="ACGT"' in dot and 'label="3" color=red' in dot


def test_assemble_region_writes_dot(tmp_path):
    rng = np.random.default_rng(0)
    ref = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 120)]
    alt = ref.copy()
    alt[60] = ord("A") if ref[60] != ord("A") else ord("G")
    reads = [_Read(ref[i:i + 50].copy(), np.full(50, 30, np.uint8))
             for i in range(0, 70, 7)]
    reads += [_Read(alt[i:i + 50].copy(), np.full(50, 30, np.uint8))
              for i in range(0, 70, 7)]
    dot_path = str(tmp_path / "graphs.dot")
    haps = assemble_region(ref, {0: reads}, kmer_sizes=(21,),
                           dot_path=dot_path, dot_prefix="r1_")
    assert len(haps) >= 2
    text = open(dot_path).read()
    assert 'digraph "r1_k21"' in text and "->" in text


def test_cli_parses_new_knobs():
    from lorikeet_tpu.cli import build_parser, _caller_config
    args = build_parser().parse_args(
        ["call", "-r", "x.fna", "-b", "y.bam",
         "--qual-by-depth-filter", "20",
         "--depth-per-sample-filter", "3",
         "--pruning-seeding-log-odds-threshold", "2.5",
         "--graph-output", "/tmp/g.dot"])
    cfg = _caller_config(args)
    assert cfg.qual_by_depth_filter == 20.0
    assert cfg.depth_per_sample_filter == 3
    assert cfg.pruning_seeding_log_odds_threshold == 2.5
    assert cfg.graph_output == "/tmp/g.dot"
