"""Similarity search over embedding columns (SURVEY §3.8 L3).

Baseline: brute-force cosine top-k — correct at any scale but O(Q·N).
Scale path: IVF (inverted-file) partitioning — assign corpus vectors to
their nearest centroid once, then probe only the closest ``nprobe``
centroid partitions per query: the candidate set shrinks by
~len(centroids)/nprobe. Both are pure DataFrame ops; the dot product is
a zip_with/aggregate fold (JVM codegen — no Python). For very wide
batch×batch scoring, a numpy `mapInPandas` BLAS kernel would beat the
fold; at 64 dims the builtin fold wins by skipping Arrow transfer.

Embeddings in the fixture are L2-normalized, so dot ≡ cosine.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays as a left-to-right double fold
    (deterministic summation order, matching DuckDB's list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, match_id, score, rank).

    The (small) query set is broadcast against the corpus — each corpus
    partition scores its rows independently, then one shuffle on
    query_id ranks the per-query candidates. Scores are rounded to 6dp
    BEFORE ranking so ordering is stable across engines/arithmetic;
    ties break on match id. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("score", F.round(dot(F.col("_qv"), F.col("_cv")), 6))
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_blas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k, BLAS flavor — the scale path for wide
    embeddings / large query batches.

    Shape: the (bounded, by contract) query matrix is broadcast to
    executors as one numpy array; each corpus partition computes a
    single ``C @ Q.T`` matmul and keeps only its *partition-local*
    top-k per query; a final window reduces the ≤ k·partitions
    candidates to the global top-k. Python cost is one vectorized
    matmul per partition (Arrow in, Arrow out); the shuffle carries
    k·partitions·queries rows, independent of corpus size — the
    tree-aggregation structure that survives a 1000-executor corpus.

    Same output contract as :func:`cosine_topk` (round-6 scores before
    ranking, ties on match id, self-matches excluded) — the two
    implementations are interchangeable and equality-tested.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from metricproxy_spark.io import ensure_package_on_workers

    spark = corpus.sparkSession
    ensure_package_on_workers(spark)
    qpd = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).toPandas()
    qids = qpd["query_id"].to_numpy()
    qmat = np.vstack(qpd["_qv"].to_numpy()).astype("float64")  # (m, d)
    bq = spark.sparkContext.broadcast((qids, qmat))

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("match_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, Q = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["match_id"].to_numpy()
            C = np.vstack(pdf["_cv"].to_numpy()).astype("float64")
            S = np.round(C @ Q.T, 6)  # (n_corpus_part, m)
            take = min(k + 1, len(cids))  # +1 absorbs a self-match
            frames = []
            for j in range(len(q_ids)):
                col = S[:, j]
                # partial top-(k+1) by (score desc, match_id asc)
                order = np.lexsort((cids, -col))[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "match_id": cids[order],
                            "score": col[order],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    cand = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv")
    ).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("match_id").asc()
    )
    return (
        cand.filter(F.col("query_id") != F.col("match_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_exact_rows: int = 1_000_000,
    on_overflow: str = "srp",
    target_block_rows: int = 65_536,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) for
    every pair with cosine ≥ threshold (unit-norm vectors ⇒ dot).

    Fully distributed block-pair sweep — NO driver materialization of
    vector data anywhere: rows hash into ``B = ceil(n /
    target_block_rows)`` blocks, every row is replicated to each of
    its B unordered block-pair groups, and one ``applyInPandas``
    matmul per group emits the above-threshold pairs with id_a < id_b.
    Each distinct pair of rows meets in EXACTLY one group (the
    unordered pair of their blocks), so no dedup pass is needed.
    Costs: shuffle = n·B rows (replication factor B, each group ≤
    ~2·target_block_rows rows), compute = the inherent O(n²) dot
    products spread evenly over B·(B+1)/2 independent tasks.

    Exactness is still quadratic COMPUTE, so the guard stands: past
    ``max_exact_rows`` (≈10¹² dots at the default) the behavior
    follows ``on_overflow``:

    - ``"srp"`` (default): dispatch to the sub-quadratic SRP-LSH
      blocking path (:func:`srp_band_pairs`) with band shape tuned to
      ``threshold``, after emitting a ``UserWarning`` — results become
      APPROXIMATE (high recall at the tuned shape, but not exhaustive).
    - ``"error"``: raise, for callers that require exact semantics.

    The probe that decides dispatch is bounded (``limit(max+1).count()``)
    so it never re-executes the full upstream lineage of ``vectors``;
    when it does not overflow, the probed value IS the corpus size and
    sizes the block count with no extra pass. The exact sweep is the
    oracle-checked baseline; SRP is its recall-tested scale sibling
    and both round scores to 6dp, so the two paths share one output
    contract.
    """
    import numpy as np
    import pandas as pd

    import pyspark.sql.types as T

    from metricproxy_spark.io import ensure_package_on_workers

    if on_overflow not in ("srp", "error"):
        raise ValueError(f"on_overflow must be 'srp' or 'error', got {on_overflow!r}")
    spark = vectors.sparkSession
    # Bounded probe: short-circuits after max+1 rows instead of counting
    # (and thus fully re-computing) the whole input.
    probed = vectors.select(id_col).limit(max_exact_rows + 1).count()
    if probed > max_exact_rows:
        if on_overflow == "error":
            raise ValueError(
                f"corpus exceeds max_exact_rows={max_exact_rows} "
                "and on_overflow='error'; use srp_band_pairs / "
                "embedding_near_dup_pairs_blocked for sub-quadratic paths"
            )
        import warnings

        warnings.warn(
            f"embedding_near_dup_pairs: corpus > {max_exact_rows} rows; "
            "falling back to approximate SRP-LSH blocking (on_overflow='srp')",
            UserWarning,
            stacklevel=2,
        )
        n_bands, band_bits = _srp_band_shape_for(threshold)
        return srp_band_pairs(
            vectors,
            threshold,
            n_bits=n_bands * band_bits,
            n_bands=n_bands,
            id_col=id_col,
            vec_col=vec_col,
        )
    ensure_package_on_workers(spark)
    n_blocks = max(1, -(-probed // max(1, target_block_rows)))
    src = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn(
        "_b", F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks)).cast("int")
    )
    partners = F.array(*[F.lit(j) for j in range(n_blocks)])
    exploded = src.select(
        "_id", "_v", "_b", F.explode(partners).alias("_ob")
    ).select(
        "_id",
        "_v",
        "_b",
        F.least("_b", "_ob").alias("_gl"),
        F.greatest("_b", "_ob").alias("_gr"),
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    t = float(threshold)
    empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []})

    def pair_sweep(key, pdf):  # (key, pdf) form — no hints, see SPARK-40770
        gl, gr = key
        if len(pdf) == 0:
            return empty
        ids = pdf["_id"].to_numpy()
        V = np.vstack(pdf["_v"].to_numpy()).astype("float64")
        if gl == gr:
            S = np.round(V @ V.T, 6)
            ri, ci = np.nonzero(S >= t)
            keep = ids[ri] < ids[ci]
            return pd.DataFrame(
                {
                    "id_a": ids[ri[keep]],
                    "id_b": ids[ci[keep]],
                    "score": S[ri[keep], ci[keep]],
                }
            )
        lm = pdf["_b"].to_numpy() == gl
        if not lm.any() or lm.all():
            return empty
        lids, rids = ids[lm], ids[~lm]
        S = np.round(V[lm] @ V[~lm].T, 6)
        ri, ci = np.nonzero(S >= t)
        ia, ib = lids[ri], rids[ci]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "score": S[ri, ci]})

    return exploded.groupBy("_gl", "_gr").applyInPandas(pair_sweep, out_schema)


def embedding_near_dup_pairs_blocked(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, IVF-blocked — the shape that survives
    corpora whose matrix does NOT fit executor memory (the broadcast
    sweep's limit): assign every vector to its ``nprobe`` nearest
    centroids, equi-join within buckets only, verify with the exact
    dot product. Pair space shrinks from n² to Σ bucket², shuffle is
    one hash partition on centroid_id; recall < 1 only for pairs whose
    members share no probed bucket (raise nprobe or train more
    centroids to trade cost for recall — recall is unit-tested against
    the exact sweep)."""
    from typing import Iterator  # noqa: F401  (kernel type hints)

    import numpy as np
    import pandas as pd

    import pyspark.sql.types as T

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(vectors.sparkSession)
    assigned = assign_centroids(
        vectors, centroids, id_col, vec_col, nprobe=nprobe
    ).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        "centroid_id",
    )
    t = float(threshold)
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def bucket_sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        # One BLAS matmul per bucket — the per-pair fold would be
        # ~20× slower at identical semantics (measured 17.7s → 1.6s
        # at sf0.1). Bucket matrices are ~n/k rows by contract.
        ids = pdf["_id"].to_numpy()
        M = np.vstack(pdf["_v"].to_numpy()).astype("float64")
        S = np.round(M @ M.T, 6)
        ri, ci = np.nonzero(S >= t)
        keep = ids[ri] < ids[ci]
        return pd.DataFrame(
            {
                "id_a": ids[ri[keep]],
                "id_b": ids[ci[keep]],
                "score": S[ri[keep], ci[keep]],
            }
        )

    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(bucket_sweep, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top ``nprobe``.
    ``centroids`` must be small (driver-bounded: k·d floats, the same
    contract the k-means trainer's own collect relies on).

    Shuffle-free shape: the k centroids are folded into ONE array row
    (collect_list agg) that rides to every vector row on a broadcast
    nested-loop join of a single-row relation; each row then ranks the
    array with array expressions — a map-only projection over the
    corpus. The previous spelling (broadcast cross join to n·k rows +
    a row_number window partitioned by ``id_col``) re-shuffled and
    re-sorted n·k rows on every call, which made each Lloyd iteration
    and every IVF bucketing pass pay a full exchange of the corpus; at
    100 TB the assignment step must not shuffle the corpus at all.
    (An inlined-literal variant was measured SLOWER: k·d literal
    doubles bloat the plan and analysis dominates.)

    Ordering contract unchanged: score = round(dot, 6) descending,
    ties on centroid_id ascending — encoded as an ascending struct
    sort over (-score, centroid_id).
    """
    cent_row = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("centroid_id").alias("cid"),
                    F.col("centroid_vec").alias("cv"),
                )
            )
        ).alias("_cents")
    )
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            (-F.round(dot(F.col(vec_col), c["cv"]), 6)).alias("_ns"),
            c["cid"].alias("_cid"),
        ),
    )
    top = F.slice(F.array_sort(scored), 1, nprobe)
    return (
        vectors.crossJoin(F.broadcast(cent_row))
        .withColumn("_probe", F.explode(top))
        .withColumn("centroid_id", F.col("_probe._cid"))
        .drop("_probe", "_cents")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid
    (nprobe=1), queries probe their ``nprobe`` nearest buckets, scoring
    happens only within probed buckets. Same output shape as
    :func:`cosine_topk`; recall < 1 by construction (tested against the
    brute-force baseline)."""
    corpus_b = assign_centroids(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("_cv"),
        "centroid_id",
    )
    queries_b = assign_centroids(
        queries, centroids, id_col, vec_col, nprobe=nprobe
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "centroid_id")
    scored = (
        corpus_b.alias("c")
        .join(
            F.broadcast(queries_b.alias("q")),
            (F.col("c.centroid_id") == F.col("q.centroid_id"))
            & (F.col("q.query_id") != F.col("c.match_id")),
        )
        .select(
            "q.query_id",
            "c.match_id",
            F.round(dot(F.col("q._qv"), F.col("c._cv")), 6).alias("score"),
        )
        .dropDuplicates(["query_id", "match_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("match_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _srp_band_shape_for(
    threshold: float, target_recall: float = 0.95, max_bands: int = 16
) -> tuple[int, int]:
    """Pick an SRP band shape (n_bands, band_bits) for a cosine threshold.

    A sign bit agrees with probability p = 1 - arccos(t)/pi; a band of r
    bits matches with p**r and recall over b bands is 1-(1-p**r)**b.
    Choose the LONGEST band (fewest collisions → smallest buckets) whose
    recall at the threshold still clears ``target_recall`` with at most
    ``max_bands`` bands — tight thresholds earn long cheap bands, loose
    ones fall back to short bands with more of them."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    best = (12, 5)  # historical default; also the p→0 fallback
    for band_bits in range(10, 1, -1):
        for n_bands in range(2, max_bands + 1):
            recall = 1.0 - (1.0 - p**band_bits) ** n_bands
            if recall >= target_recall:
                return (n_bands, band_bits)
    return best


def srp_band_pairs(
    vectors: DataFrame,
    threshold: float,
    n_bits: int = 60,
    n_bands: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH — the
    fully-distributed blocking scheme (no broadcast matrix, no trained
    centroids): each vector's signature is the sign pattern of ``n_bits``
    fixed random hyperplane projections; signatures split into
    ``n_bands`` bands, vectors sharing any band bucket become candidate
    pairs, and candidates are verified with the exact dot product.

    Pr[sign bits agree] = 1 - angle/pi, so high-cosine pairs collide in
    some band with high probability while the bucket join touches only
    O(sum bucket^2) candidates — the SimHash construction applied to
    dense vectors. Band shape is THE recall/cost knob: shorter bands
    raise recall at a given threshold but widen buckets (12x5 gives
    ~0.72 expected recall at cosine 0.4; at production thresholds
    ~0.9, 8x8 exceeds 0.99 with far smaller buckets). Everything shuffles by (band, bucket): no stage
    depends on corpus size beyond the hash join, which is what lets
    this run where the O(n^2/p) broadcast sweep and even the IVF blocks
    stop fitting. Hyperplanes derive from ``seed`` — signatures are
    reproducible across runs/executors by construction.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from metricproxy_spark.io import ensure_package_on_workers

    spark = vectors.sparkSession
    ensure_package_on_workers(spark)
    band_bits = n_bits // n_bands
    weights = (1 << np.arange(band_bits)).astype("int64")

    @pandas_udf(ArrayType(LongType()))
    def band_keys(vs: pd.Series) -> pd.Series:
        # Hyperplanes are re-derived per executor from the seed: cheap
        # (dim x n_bits doubles) and avoids a broadcast dependency.
        mat = np.vstack(vs.to_numpy()).astype("float64")
        planes = np.random.RandomState(seed).standard_normal(
            (mat.shape[1], n_bits)
        )
        signs = mat @ planes >= 0.0  # (n, n_bits)
        keys = np.empty((signs.shape[0], n_bands), dtype="int64")
        for b in range(n_bands):
            band = signs[:, b * band_bits : (b + 1) * band_bits]
            keys[:, b] = (b << band_bits) + band @ weights
        return pd.Series(list(keys))

    # Candidate generation carries ONLY ids — the bucket self-join and
    # the pair dedup shuffle 16 bytes/row instead of dragging two
    # 64-float vectors through every collision. Vectors rejoin once per
    # verified pair side afterwards (broadcast when the corpus is small;
    # plain hash join at scale — both narrow per-pair lookups).
    # Both sides of the bucket self-join read this frame; one eager
    # id+bandkey-sized checkpoint runs the projection pass (and its
    # pandas UDF) once instead of once per join side.
    buckets = vectors.select(
        F.col(id_col).alias("_id"),
        F.explode(band_keys(F.col(vec_col))).alias("_bk"),
    ).localCheckpoint(eager=True)
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), "_bk")
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        # a pair colliding in k bands appears k times; dedup BEFORE the
        # dot product so verification work is per-pair, not per-collision
        .dropDuplicates(["id_a", "id_b"])
    )
    va = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    vb = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            # 6dp round matches the exact sweep's output contract, so a
            # caller dispatched here by the overflow guard sees the same
            # precision it would have gotten from the broadcast path.
            F.round(dot(F.col("_va"), F.col("_vb")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
