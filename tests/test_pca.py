"""Distributed PCA: orthonormality, variance ordering, reconstruction
descent, projection determinism across partitionings, and agreement
with a single-node numpy PCA on the same data."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.operators.pca import project_pca, train_pca


def _fit(spark, sf_dir, k=4):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, train_pca(emb, "embedding", k=k)


def test_components_orthonormal(spark, sf_dir):
    _, (comps, _, _) = _fit(spark, sf_dir)
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(comps.shape[0]), atol=1e-9)


def test_explained_variance_descending_and_positive(spark, sf_dir):
    _, (_, _, ev) = _fit(spark, sf_dir)
    assert np.all(ev[:-1] >= ev[1:] - 1e-12)
    assert np.all(ev > 0)


def test_matches_single_node_numpy_pca(spark, sf_dir):
    emb, (comps, mean, ev) = _fit(spark, sf_dir)
    x = np.asarray(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    ref = evecs[:, order].T
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(ev, evals[order], atol=1e-9)
    # components match up to sign
    for i in range(4):
        dot = abs(float(ref[i] @ comps[i]))
        assert dot > 1 - 1e-9, (i, dot)


def test_projection_variance_ordering_and_mean_zero(spark, sf_dir):
    emb, (comps, mean, ev) = _fit(spark, sf_dir)
    pdf = (
        project_pca(emb, comps, mean, "embedding")
        .select("pc1", "pc2", "pc3", "pc4")
        .toPandas()
    )
    variances = pdf.var(ddof=0).to_numpy()
    # projection variance along each PC equals its eigenvalue
    assert np.allclose(variances, ev, rtol=1e-3)
    assert np.all(np.abs(pdf.mean().to_numpy()) < 1e-6)


def test_projection_stable_across_partitionings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = {}
    for n_parts in (1, 7):
        comps, mean, _ = train_pca(emb.repartition(n_parts), "embedding", k=2)
        pdf = (
            project_pca(emb, comps, mean, "embedding")
            .select("vec_id", "pc1", "pc2")
            .orderBy("vec_id")
            .toPandas()
        )
        out[n_parts] = pdf
    a, b = out[1], out[7]
    assert (a.vec_id == b.vec_id).all()
    # float partial-sum order differs; results agree far below 1e-5
    assert np.allclose(a.pc1, b.pc1, atol=1e-5)
    assert np.allclose(a.pc2, b.pc2, atol=1e-5)


def test_reconstruction_error_decreases_with_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    x = np.asarray(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    errs = []
    for k in (1, 2, 4, 8):
        comps, mean, _ = train_pca(emb, "embedding", k=k)
        proj = (x - mean) @ comps.T
        recon = proj @ comps + mean
        errs.append(float(((x - recon) ** 2).sum()))
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < errs[0]
