"""Similarity-search queries over ``embeddings`` (SURVEY §3.8 L3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.operators.kmeans import train_kmeans
from metricproxy_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_blas,
    ivf_topk,
)
from metricproxy_spark.registry import register


@register(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS match_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, match_id,
               round(list_dot_product(qv, cv), 6) AS score
        FROM q, c WHERE query_id <> match_id
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, match_id) AS rank
        FROM scored
    )
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 baseline: brute-force cosine top-3 for 10 query vectors.
    Unit-norm embeddings ⇒ dot = cosine; the JVM-side zip_with/aggregate
    fold matches DuckDB's list_dot_product order, and 6dp rounding
    before ranking removes any last-ulp ordering hazard."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, k=3)


@register("sim_ivf_topk")
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: IVF-partitioned approximate top-3 (every 50th
    vector serves as a centroid, nprobe=2). Rows-only check; recall vs.
    the brute-force baseline asserted in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return ivf_topk(queries, emb, centroids, k=3, nprobe=2)


@register(
    "sim_topk_blas",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS match_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, match_id,
               round(list_dot_product(qv, cv), 6) AS score
        FROM q, c WHERE query_id <> match_id
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, match_id) AS rank
        FROM scored
    )
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def sim_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path (exact flavor): partition-local BLAS matmul +
    partial top-k, global window reduce. Same oracle as the fold-based
    baseline — agreement shows the numpy path is bit-stable at 6dp
    rounding on this corpus AND that the partial-top-k/global-reduce
    tree loses nothing (its shuffle is k·partitions·queries rows,
    independent of corpus size)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_blas(queries, emb, k=3)


@register(
    "sim_kmeans_assign",
    oracle="""
    WITH c AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 8
    ), v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), scored AS (
        SELECT v.vec_id, c.centroid_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY round(list_dot_product(e, cv), 6) DESC,
                            c.centroid_id ASC
               ) AS rn
        FROM v CROSS JOIN c
    )
    SELECT vec_id, centroid_id FROM scored WHERE rn = 1
    """,
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: one k-means assignment step (the IVF bucketing primitive) —
    nearest-cosine centroid per vector, k=8 deterministic init
    (lowest-id vectors). Broadcast join + per-row argmax: the corpus
    never shuffles. Oracle is the quadratic cross-join argmin twin;
    round-6 before ranking + centroid-id tiebreak make it exact."""
    from metricproxy_spark.operators.kmeans import assign, deterministic_init

    emb = load_table(spark, sf_dir, "embeddings")
    init = deterministic_init(emb, k=8, id_col="vec_id", vec_col="embedding")
    return assign(emb, init, "vec_id", "embedding").select(
        "vec_id", "centroid_id"
    )


@register("sim_kmeans_train")
def sim_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: full spherical k-means training (Lloyd, k=8, ≤5 iterations)
    followed by a final assignment — this is how the IVF index's
    centroids are actually built. Per iteration: broadcast-join
    assignment (no corpus shuffle) + posexplode/hash-agg means (k·d
    partial rows per task); only the k·d centroid matrix visits the
    driver. Rows-only check (iterative fixpoint has no SQL twin);
    convergence on planted clusters is unit-tested."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Iteration aggregates are k*d-row shapes: scope the shuffle width
    # to them for the training loop (restored after), like the
    # stateful-stream query does. On a real cluster this is the
    # "small-agg stage" partition sizing rule, not a data change.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        centroids = train_kmeans(emb, k=8, max_iter=5)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    from metricproxy_spark.operators.kmeans import assign

    return assign(emb, centroids, "vec_id", "embedding").select(
        "vec_id", "centroid_id"
    )
