"""Distributed spherical k-means (Lloyd iterations) — trains the
centroids the IVF index (SURVEY §3.8 L3, operators/similarity.py
ivf_topk) probes. The reference proxy has no ML surface; this is
engine-extension territory (SURVEY §3.8), built the way Spark MLlib's
KMeans structures the work, from public API only.

Scale shape (the part that must survive 100 TB):

- Assignment is a broadcast join (k centroids ≪ corpus) + per-row
  argmax — no shuffle of the corpus.
- Mean recomputation is ``posexplode`` → ``groupBy(cluster, pos).avg``:
  hash aggregation with map-side partial combine, so each task emits at
  most k·d partial rows regardless of its input size; the shuffle is
  O(k·d·tasks), independent of corpus rows.
- Only the k·d centroid matrix ever reaches the driver (the same
  bounded collect MLlib does between iterations); corpus rows never do.
- Lineage does not grow across iterations because each iteration's
  centroids are rebuilt from driver-local literals.

Determinism: init = the k lowest-id vectors, ties in assignment break
on centroid_id asc, scores rounded to 6dp before comparison — the same
contract the similarity operators use, so a single-step assignment is
DuckDB-oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.operators.similarity import assign_centroids


def deterministic_init(
    vectors: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """First-k-by-id init: reproducible across engines and runs (no RNG
    — Date-free, seed-free). k-means++ would converge faster on nasty
    corpora; determinism is worth more here and Lloyd still converges."""
    return (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )


def assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """One assignment step: nearest (max-cosine) centroid per vector.
    Returns (id_col, vec_col, centroid_id)."""
    return assign_centroids(vectors, centroids, id_col, vec_col, nprobe=1)


def recompute_centroids(
    assigned: DataFrame,
    vec_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Element-wise mean per cluster via posexplode + hash agg (partial
    combine keeps the shuffle at k·d rows per task). ``normalize``
    re-projects means onto the unit sphere (spherical k-means) so
    dot ≡ cosine stays true for the next assignment step."""
    dims = (
        assigned.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("_pos", "_x")
        )
        .groupBy("centroid_id", "_pos")
        .agg(F.avg("_x").alias("_mean"))
    )
    arrs = (
        dims.groupBy("centroid_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_mean"))
            ).alias("_pm")
        )
        .select(
            "centroid_id",
            F.transform(F.col("_pm"), lambda s: s["_mean"]).alias("_m"),
        )
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                F.col("_m"), F.lit(0.0), lambda acc, v: acc + v * v
            )
        )
        arrs = arrs.select(
            "centroid_id",
            F.transform(F.col("_m"), lambda v: v / norm).alias("centroid_vec"),
        )
    else:
        arrs = arrs.select("centroid_id", F.col("_m").alias("centroid_vec"))
    return arrs


def train_kmeans(
    vectors: DataFrame,
    k: int,
    max_iter: int = 8,
    tol: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd loop: assign → recompute means → check movement on the
    driver (k·d doubles only). Returns the final centroids DataFrame
    (centroid_id, centroid_vec) ready for :func:`ivf_topk`.

    Empty clusters keep their previous centroid (standard Lloyd
    fallback), so k is stable across iterations.
    """
    import math

    spark: SparkSession = vectors.sparkSession
    # Persist the projected corpus for the loop (MLlib's own rule:
    # cache the training input) — each iteration is then ONE job over
    # the materialized rows instead of a fresh scan per iteration.
    base = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    ).persist()
    try:
        cur = {
            r["centroid_id"]: list(r["centroid_vec"])
            for r in deterministic_init(base, k, "_vid", "_vec").collect()
        }
        for _ in range(max_iter):
            cdf = spark.createDataFrame(
                [(cid, vec) for cid, vec in sorted(cur.items())],
                "centroid_id long, centroid_vec array<double>",
            )
            assigned = assign(base, cdf, "_vid", "_vec")
            # Mean recompute collapsed to its single irreducible
            # shuffle: the (centroid, pos) partial-avg agg — k·d rows —
            # collected directly; the array re-assembly and the unit-
            # norm projection are k·d driver arithmetic (same
            # left-to-right IEEE fold the Spark expressions computed),
            # saving a second exchange + array_sort pass per iteration.
            dim_rows = (
                assigned.select(
                    "centroid_id",
                    F.posexplode(F.col("_vec")).alias("_pos", "_x"),
                )
                .groupBy("centroid_id", "_pos")
                .agg(F.avg("_x").alias("_mean"))
                .collect()
            )
            by_cid: dict = {}
            for r in dim_rows:
                by_cid.setdefault(r["centroid_id"], {})[r["_pos"]] = r["_mean"]
            new = {}
            for cid, pm in by_cid.items():
                m = [pm[p] for p in sorted(pm)]
                acc = 0.0
                for v in m:
                    acc = acc + v * v
                norm = math.sqrt(acc)
                new[cid] = [v / norm for v in m]
            merged = {cid: new.get(cid, vec) for cid, vec in cur.items()}
            move = max(
                math.sqrt(
                    sum((a - b) ** 2 for a, b in zip(merged[cid], cur[cid]))
                )
                for cid in cur
            )
            cur = merged
            if move < tol:
                break
    finally:
        base.unpersist()
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(cur.items())],
        "centroid_id long, centroid_vec array<double>",
    )
