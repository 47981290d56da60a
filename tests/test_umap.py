"""In-process UMAP (strain/umap.py) — the flight-subprocess replacement
(haplotype_clustering_engine.rs:240-257): embedding quality, determinism,
and integration with variant-group clustering."""
import numpy as np

from lorikeet_tpu.strain.umap import fuzzy_simplicial_set, umap_embed


def _blobs(n_per=50, n_blobs=3, d=6, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (n_blobs, d))
    X = np.concatenate([c + rng.normal(0, 0.3, (n_per, d)) for c in centers])
    labels = np.repeat(np.arange(n_blobs), n_per)
    return X, labels


def test_fuzzy_set_is_symmetric_probability():
    X, _ = _blobs(20, 2)
    P = fuzzy_simplicial_set(X, 10)
    assert np.allclose(P, P.T)
    assert P.min() >= 0.0 and P.max() <= 1.0 + 1e-12
    assert np.all(np.diag(P) == 0.0)


def test_embedding_separates_blobs_deterministically():
    X, labels = _blobs()
    Y = umap_embed(X, seed=3)
    assert Y.shape == (len(X), 2)
    cent = np.stack([Y[labels == g].mean(0) for g in range(3)])
    intra = np.mean([np.linalg.norm(Y[labels == g] - cent[g], axis=1).mean()
                     for g in range(3)])
    inter = np.mean([np.linalg.norm(cent[i] - cent[j])
                     for i in range(3) for j in range(i + 1, 3)])
    assert inter / intra > 3.0, "blobs not separated in the embedding"
    assert np.allclose(Y, umap_embed(X, seed=3)), "not deterministic"
    assert not np.allclose(Y, umap_embed(X, seed=4)), "seed has no effect"


def test_tiny_inputs_do_not_crash():
    X = np.array([[0.0, 0.1], [0.9, 1.0]])
    Y = umap_embed(X)
    assert Y.shape == (2, 2)
    Y5 = umap_embed(np.random.default_rng(0).normal(size=(5, 3)),
                    n_neighbors=15)
    assert Y5.shape == (5, 2) and np.isfinite(Y5).all()


def test_cluster_variants_uses_umap_groups():
    """Two clearly distinct depth profiles over 4 samples cluster into two
    variant groups via the UMAP+HDBSCAN path."""
    from lorikeet_tpu.models.variants import Allele, Genotype, VariantContext
    from lorikeet_tpu.strain.genotype_mode import cluster_variants

    rng = np.random.default_rng(1)
    contexts = []
    for i in range(24):
        alleles = [Allele(b"A", True), Allele(b"T", False)]
        vc = VariantContext(0, i * 10, i * 10, alleles)
        vc.attributes["_ALT_INDEX"] = 1
        hot = (0, 1) if i % 2 == 0 else (2, 3)
        for s in range(4):
            frac = 0.9 if s in hot else 0.05
            alt = int(frac * 100 + rng.integers(0, 4))
            g = Genotype(s, 2, None, ad=np.array([100 - alt, alt]))
            vc.genotypes.append(g)
        contexts.append(vc)
    labels, sep = cluster_variants(contexts, min_cluster_size=5)
    groups = set(labels.tolist()) - {-1}
    assert len(groups) == 2
    # the two groups split exactly by profile parity
    par0 = {labels[i] for i in range(0, 24, 2)}
    par1 = {labels[i] for i in range(1, 24, 2)}
    assert par0.isdisjoint(par1)
    assert sep.shape == (max(groups) + 1, max(groups) + 1)
    assert np.isfinite(sep[tuple(sorted(groups))[0], tuple(sorted(groups))[-1]])
