"""Side-by-side vectors for the two abundance estimators (VERDICT item 7).

`--abundance-mode reference` re-implements the reference's exact semantics:
ref-allele mass duplicated into every non-carrying strain
(abundance_calculator_engine.rs:190-215) + the centrifuge-style EM
(strain_abundances_calculator.rs:38-160) + the engine's one-pass culling
(abundance_calculator_engine.rs:296 `something_removed` is hard-false).

The default `leftover` estimator scales EM thetas by total observed alt
mass and assigns the residue to the reference strain.  These vectors pin
down where the two agree (single strain + reference) and where they
diverge (multi-strain mixtures, where ref-mass duplication inflates strain
masses and starves the reference strain).
"""
import numpy as np

from lorikeet_tpu.strain.genotype_mode import (
    abundance_em, abundance_em_reference, run_abundance_reference)


def leftover_estimate(X, membership, n_strains):
    """The default estimator's arithmetic as run_genotype applies it
    (strain/genotype_mode.py run_genotype): EM shape * alt-mass scale,
    residue -> reference strain."""
    theta = abundance_em(X[:, 0], membership)
    total = 0.0
    for k in range(n_strains):
        fr = [X[v, 0] for v, m in enumerate(membership) if m == [k]] or \
             [X[v, 0] for v, m in enumerate(membership) if k in m]
        if fr:
            total += float(np.median(fr))
    total = min(1.0, total)
    return theta * total, max(0.0, 1.0 - total)


def test_single_strain_plus_reference_modes_agree():
    # one strain at 0.6, reference strain at 0.4: the estimators agree
    # (the deviation note's documented common case)
    V = 6
    X = np.full((V, 1), 0.6)
    R = np.full((V, 1), 0.4)
    membership = [[0]] * V

    thetas, kept, ref_idx = run_abundance_reference(X, R, membership, 1, True)
    assert kept == [0, 1] and ref_idx == 1
    np.testing.assert_allclose(thetas[0], [0.6, 0.4], atol=1e-9)

    strain_mass, ref_mass = leftover_estimate(X, membership, 1)
    np.testing.assert_allclose(strain_mass, [0.6], atol=1e-9)
    assert abs(ref_mass - 0.4) < 1e-9


def test_mixture_modes_diverge_leftover_matches_truth():
    # planted: strain A = 0.5, strain B = 0.3, reference strain = 0.2.
    # Reference semantics duplicate each variant's ref mass into the OTHER
    # strain and the reference strain, inflating A/B and culling the
    # reference strain entirely; the leftover estimator recovers the
    # planted fractions exactly.
    planted = np.array([0.5, 0.3, 0.2])
    X = np.array([[0.5]] * 5 + [[0.3]] * 5)
    R = 1.0 - X
    membership = [[0]] * 5 + [[1]] * 5

    thetas, kept, ref_idx = run_abundance_reference(X, R, membership, 2, True)
    got_ref_mode = np.array([thetas[0][0], thetas[0][1],
                             thetas[0][2] if 2 in kept else 0.0])
    # documented divergence: ref strain culled, A/B inflated
    assert 2 not in kept
    assert np.abs(got_ref_mode - planted).max() > 0.1

    strain_mass, ref_mass = leftover_estimate(X, membership, 2)
    got_leftover = np.array([strain_mass[0], strain_mass[1], ref_mass])
    np.testing.assert_allclose(got_leftover, planted, atol=1e-6)
    # side-by-side: leftover strictly closer to planted truth
    assert (np.abs(got_leftover - planted).max()
            < np.abs(got_ref_mode - planted).max())


def test_reference_mode_culls_unsupported_strain():
    # a strain whose variants never appear keeps weight <= eps in every
    # sample and is removed from the printed set (engine removal loop)
    X = np.array([[0.7], [0.7], [0.0], [0.0]])
    R = np.array([[0.3], [0.3], [1.0], [1.0]])
    membership = [[0], [0], [1], [1]]
    thetas, kept, ref_idx = run_abundance_reference(X, R, membership, 2, False)
    assert 1 not in kept and 0 in kept


def test_reference_em_weight_partition_is_raw_not_normalised():
    # the reference prints raw abundance_weight values; with two equal
    # strains and no ref mass they split the mass evenly
    X = np.array([[0.5], [0.5]])
    R = np.zeros_like(X)
    membership = [[0], [1]]
    present = np.ones(2, bool)
    aw = abundance_em_reference(X[:, 0], R[:, 0], membership, 2, present)
    np.testing.assert_allclose(aw, [0.5, 0.5], atol=1e-6)


def test_cli_accepts_abundance_mode():
    from lorikeet_tpu.cli import build_parser
    p = build_parser()
    args = p.parse_args(["genotype", "-r", "x.fna", "-b", "x.bam",
                         "--abundance-mode", "reference"])
    assert args.abundance_mode == "reference"
    args = p.parse_args(["genotype", "-r", "x.fna", "-b", "x.bam"])
    assert args.abundance_mode == "leftover"
