"""Distributed PCA: parity with numpy's exact PCA + structural invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from openlogreplicator_spark.operators import linalg
from openlogreplicator_spark.sources.tables import load_table


def _corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    return emb, ids, m


def test_fit_pca_matches_numpy(spark, sf_dir):
    emb, _, m = _corpus(spark, sf_dir)
    dim = m.shape[1]
    mean, comps, var = linalg.fit_pca(emb, dim, k=4)
    assert np.allclose(mean, m.mean(axis=0), atol=1e-9)
    cov = np.cov(m.T, bias=True)
    w, v = np.linalg.eigh(cov)
    top = np.sort(w)[::-1][:4]
    assert np.allclose(np.sort(var)[::-1], top, rtol=1e-8)
    # components span the same subspace as numpy's top eigenvectors
    ref = v[:, np.argsort(w)[::-1][:4]]
    overlap = np.abs(comps @ ref)  # |cos| between each pair
    assert np.allclose(np.sort(overlap.max(axis=1)), np.ones(4), atol=1e-6)


def test_pca_components_orthonormal_and_var_desc(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    _, comps, var = linalg.fit_pca(emb, dim, k=6)
    assert np.allclose(comps @ comps.T, np.eye(6), atol=1e-9)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(5))


def test_projection_distributed_matches_local(spark, sf_dir):
    emb, ids, m = _corpus(spark, sf_dir)
    dim = m.shape[1]
    mean, comps, var = linalg.fit_pca(emb, dim, k=3)
    out = {
        r.vec_id: np.array(r.proj)
        for r in linalg.project_pca(emb, mean, comps).collect()
    }
    expect = (m - mean) @ comps.T
    got = np.array([out[i] for i in ids])
    assert np.allclose(got, expect, atol=1e-9)


def test_whitened_projection_unit_variance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    mean, comps, var = linalg.fit_pca(emb, dim, k=3)
    proj = linalg.project_pca(emb, mean, comps, whiten_var=var)
    stats = proj.select(
        *[
            F.variance(F.element_at("proj", i + 1)).alias(f"v{i}")
            for i in range(3)
        ]
    ).collect()[0]
    n = emb.count()
    # population-vs-sample correction: expected sample variance n/(n-1)
    for i in range(3):
        assert abs(stats[f"v{i}"] - n / (n - 1)) < 0.05


def test_embedding_pca_query_runs(spark, sf_dir):
    """The driver entry emits the invariant contract — one row whose
    booleans a correct PCA must all satisfy."""
    rows = linalg.embedding_pca(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_vecs == load_table(spark, sf_dir, "embeddings").count()
    assert r.orthonormal_ok and r.centered_ok and r.whitened_ok
