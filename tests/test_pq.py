"""Product quantization (operators/pq.py): encode determinism and
bounds, training actually reduces reconstruction error, and ADC top-k
recall against the exact baseline on the clustered embeddings fixture."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.operators.pq import (
    pq_adc_topk,
    pq_decode_error,
    pq_encode,
    train_pq_codebooks,
)

M, K = 32, 16


def test_encode_shape_bounds_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=M, k=K, max_iter=2)
    assert np.asarray(books).shape == (M, K, 64 // M)
    a = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
    b = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
    assert a == b  # no RNG anywhere
    assert all(len(c) == M for c in a.values())
    assert all(0 <= x < K for c in a.values() for x in c)


def test_training_reduces_reconstruction_error(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    trained = train_pq_codebooks(emb, m=M, k=K, max_iter=6)
    init_only = train_pq_codebooks(emb, m=M, k=K, max_iter=0)

    def mean_err(books) -> float:
        return (
            pq_decode_error(emb, books)
            .agg(F.avg("sq_err").alias("e"))
            .first()["e"]
        )

    e_trained, e_init = mean_err(trained), mean_err(init_only)
    assert e_trained < e_init * 0.9, (e_trained, e_init)


def test_adc_recall_vs_exact(spark, sf_dir):
    """ADC ranking from compact codes must keep most of the exact
    top-10: mean recall@10 >= 0.5 on the clustered fixture (PQ with
    m=32, k=16 packs 64 float32 into 32 nibble codes, an 16x
    compression — recall well above chance but below exact, like the
    IVF/SRP siblings)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=M, k=K, max_iter=6)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    got = pq_adc_topk(queries, codes, books, k_top=10)
    approx = {}
    for r in got.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)

    # exact L2 top-10 (ADC approximates L2; embeddings are unit-norm so
    # the ranking also matches cosine)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    qmask = ids < 10
    recalls = []
    for qi in np.nonzero(qmask)[0]:
        d2 = ((X - X[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))[:10]
        exact = set(ids[order].tolist())
        qid = int(ids[qi])
        recalls.append(len(exact & approx[qid]) / 10)
    assert float(np.mean(recalls)) >= 0.5, recalls
