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


@register(
    "sim_quantize_int8",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        FROM embeddings
    ), scaled AS (
        SELECT vec_id, dv,
               list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
        FROM v
    ), q AS (
        SELECT vec_id, scale,
               list_transform(dv, x -> CAST(round(x / scale, 0) AS INT)) AS qv,
               dv
        FROM scaled
    )
    SELECT vec_id,
           CAST(len(qv) AS INT) AS n_dims,
           round(scale, 9) AS scale,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(qv, x -> CAST(x AS BIGINT))),
               (a, b) -> a + b) AS sum_q,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(qv, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))),
               (a, b) -> a + b) AS sum_q2,
           round(list_max(list_transform(dv,
               x -> abs(x - round(x / scale, 0) * scale))), 9)
             AS max_abs_err
    FROM q
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 storage path: per-vector symmetric int8 scalar quantization
    (scale = max|x|/127) with exact integer invariants (sum, sum of
    squares) and the max reconstruction error. Everything is a per-row
    Catalyst higher-order-function projection — no shuffle, no Python —
    so at 100 TB this is a map-only pass that cuts the embedding store
    4x before the IVF index is built. The staged .select()s keep
    CollapseProject from re-embedding the quantized array expression
    into every consumer (the minhash lesson)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform("embedding", lambda x: x.cast("double"))
    staged = emb.select("vec_id", dv.alias("dv"))
    scaled = staged.select(
        "vec_id",
        "dv",
        (
            F.array_max(F.transform("dv", F.abs)) / F.lit(127.0)
        ).alias("scale"),
    )
    q = scaled.select(
        "vec_id",
        "dv",
        "scale",
        F.transform(
            "dv", lambda x: F.round(x / F.col("scale"), 0).cast("int")
        ).alias("qv"),
    )
    # max_abs_err must see the UNROUNDED scale: Spark 4's lateral column
    # alias resolution would bind F.col("scale") to a sibling
    # round(scale, 9).alias("scale") in the same select, so the error
    # fold is staged before the display rounding.
    erred = q.select(
        "vec_id",
        "scale",
        "qv",
        F.array_max(
            F.zip_with(
                "dv",
                "qv",
                lambda d, qi: F.abs(d - qi.cast("double") * F.col("scale")),
            )
        ).alias("raw_err"),
    )
    zero = F.lit(0).cast("bigint")
    return erred.select(
        "vec_id",
        F.size("qv").alias("n_dims"),
        F.round("scale", 9).alias("scale"),
        F.aggregate(
            "qv", zero, lambda a, x: a + x.cast("bigint")
        ).alias("sum_q"),
        F.aggregate(
            "qv", zero, lambda a, x: a + x.cast("bigint") * x.cast("bigint")
        ).alias("sum_q2"),
        F.round("raw_err", 9).alias("max_abs_err"),
    )


@register("sim_pq_topk")
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 compression path: product-quantization ADC top-3 — train m=32
    sub-codebooks (k=16) on the corpus, encode every vector to 32
    nibble codes (16× smaller than the floats), then answer the same 10
    queries as the exact baselines from codes alone via per-query
    distance tables. Rows-only check; recall and reconstruction-error
    invariants are asserted in tests/test_pq.py."""
    from metricproxy_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=32, k=16, max_iter=4)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_adc_topk(queries, codes, books, k_top=3)


@register("sim_ivfpq_topk")
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 index composition: IVF-PQ (IVFADC) top-3 — a spherical-k-means
    coarse quantizer buckets the corpus into 8 inverted lists, residuals
    are product-quantized (m=32, k=16), and each query probes only its 3
    nearest lists, ranking codes by asymmetric distance. Search reads
    ints from ~3/8 of the corpus instead of every float. Rows-only
    check; recall/pruning/determinism invariants live in
    tests/test_ivfpq.py."""
    from metricproxy_spark.operators.ivfpq import build_ivfpq, ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # Training aggregates are k*d-row shapes — scope the shuffle width
    # to them for the build (restored after), as sim_kmeans_train does.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        index = build_ivfpq(emb, kc=8, m=32, k=16, coarse_iter=2, pq_iter=2)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_adc_topk(queries, index, k_top=3, nprobe=3)


@register(
    "sim_mrl_truncate",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), t AS (
        SELECT vec_id, e[1:16] AS t16,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(e[1:16], x -> x * x)),
                    (a, b) -> a + b)) AS norm16
        FROM v
    )
    SELECT vec_id,
           CAST(16 AS INT) AS dims_kept,
           round(norm16, 6) AS norm16,
           round(norm16 * norm16, 6) AS retained_energy,
           round(t16[1] / norm16, 6) AS first_component_renormed
    FROM t
    """,
)
def sim_mrl_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 storage path: Matryoshka-style truncation — keep the first 16
    of 64 dims and L2-renormalize (Kusupati et al. 2022: nested
    representations let one index serve several dim budgets). For
    unit-norm inputs the retained energy ‖e[:16]‖² IS the cosine
    between the full vector and its zero-padded truncation, so the
    projection doubles as the fidelity report. Pure array HOFs — a
    narrow map-only stage; the truncated column is the 4× cheaper
    index payload. Ranking-overlap vs the full index is asserted in
    tests (top-k with truncated vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    t16 = F.slice(F.col("embedding").cast("array<double>"), 1, 16)
    norm16 = F.sqrt(
        F.aggregate(t16, F.lit(0.0), lambda a, x: a + x * x)
    )
    return emb.select(
        "vec_id",
        F.lit(16).cast("int").alias("dims_kept"),
        F.round(norm16, 6).alias("norm16"),
        F.round(norm16 * norm16, 6).alias("retained_energy"),
        F.round(F.element_at(t16, 1) / norm16, 6).alias(
            "first_component_renormed"
        ),
    )


@register(
    "sim_lang_centroids",
    oracle="""
    WITH joined AS (
        SELECT d.lang, CAST(e.embedding AS DOUBLE[]) AS v
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ), dims AS (
        SELECT lang, u.o.pos AS pos, u.o.x AS x
        FROM joined, UNNEST(list_transform(range(1, len(v) + 1),
                         i -> {'pos': i, 'x': v[i]})) AS u(o)
    )
    SELECT lang, CAST(pos AS INT) AS pos,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                 / count(*), 9) AS mean_x
    FROM dims WHERE pos <= 4
    GROUP BY lang, pos
    """,
)
def sim_lang_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal composition: join the text table to its embedding
    rows (doc_id = vec_id) and compute per-language mean vectors —
    the "domain centroid" a curation pipeline uses to score drift.
    posexplode → (lang, dim) hash agg with exact decimal sums (12dp —
    float32 inputs widen exactly), reported for the first 4 dims to
    keep the manifest small. Scale: the join is id-keyed co-shuffle;
    the agg key space is |langs|·d regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    joined = docs.join(emb, docs.doc_id == emb.vec_id)
    dims = joined.select(
        "lang", F.posexplode("v").alias("pos0", "x")
    ).select("lang", (F.col("pos0") + 1).alias("pos"), "x")
    return (
        dims.where(F.col("pos") <= 4)
        .groupBy("lang", F.col("pos").cast("int").alias("pos"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_x"),
        )
    )


@register("sim_pq_rerank")
def sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 two-stage retrieval (the production ANN shape): PQ/ADC coarse
    search over-fetches top-20 CANDIDATES from codes alone (16×
    compressed, floats never read), then ONLY those ~20 rows per query
    are re-ranked by the exact dot product on the true vectors — the
    re-rank join touches O(queries · 20) corpus rows, not the corpus.
    Recovers most of the recall the quantization lost at ~0 extra
    scan cost; tests/test_round4_ops.py asserts rerank recall ≥ pure
    ADC recall against the exact baseline. Rows-only (PQ training is
    iterative/approximate by design)."""
    from pyspark.sql import Window

    from metricproxy_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from metricproxy_spark.operators.similarity import dot

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=32, k=16, max_iter=4)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    cands = pq_adc_topk(queries, codes, books, k_top=20).select(
        "query_id", "neighbor_id"
    )
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qv"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_cv"),
    )
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("score", F.round(dot(F.col("_qv"), F.col("_cv")), 6))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )


@register(
    "sim_embedding_moments",
    oracle="""
    WITH comp AS (
        SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings
    ), agg AS (
        SELECT pos,
               count(*) AS n,
               CAST(SUM(CAST(v AS DECIMAL(27,9))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE) AS svv,
               min(v) AS min_v,
               max(v) AS max_v
        FROM comp GROUP BY pos
    )
    SELECT CAST(pos AS BIGINT) AS dim,
           n,
           round(sv / n, 9) AS mean,
           round(svv / n - (sv / n) * (sv / n), 9) AS variance,
           round(min_v, 9) AS min_v,
           round(max_v, 9) AS max_v
    FROM agg
    """,
)
def sim_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 corpus diagnostics: per-DIMENSION moments of the embedding
    matrix (mean, population variance, min, max) — the first thing a
    pipeline computes before whitening/quantization/PCA (dead or
    saturated dimensions show up here). posexplode → one hash agg with
    map-side combine: 64 output rows regardless of corpus size.

    Exactness: Σv and Σv² go through exact decimals; mean and variance
    are then a fixed double expression rounded at 9dp on both
    engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "v"
        )
    )
    agg = comp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,9)")).cast("double").alias("sv"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,18)"))
        .cast("double")
        .alias("svv"),
        F.min("v").alias("min_raw"),
        F.max("v").alias("max_raw"),
    )
    return agg.select(
        F.col("pos").cast("bigint").alias("dim"),
        "n",
        F.round(F.col("sv") / F.col("n"), 9).alias("mean"),
        F.round(
            F.col("svv") / F.col("n")
            - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n")),
            9,
        ).alias("variance"),
        F.round("min_raw", 9).alias("min_v"),
        F.round("max_raw", 9).alias("max_v"),
    )


@register(
    "sim_pca_variance_check",
    oracle="""
    WITH comp AS (
        SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings
    ), agg AS (
        SELECT pos,
               count(*) AS n,
               CAST(SUM(CAST(v AS DECIMAL(27,9))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE) AS svv
        FROM comp GROUP BY pos
    ), pervar AS (
        SELECT n, CAST(svv / n - (sv / n) * (sv / n) AS DECIMAL(27,9))
                  AS var_dec
        FROM agg
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dims,
           CAST(min(n) AS BIGINT) AS n_vectors,
           CAST(SUM(var_dec) AS DOUBLE) AS total_variance,
           TRUE AS eig_sum_matches
    FROM pervar
    """,
)
def sim_pca_variance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-checked evidence for the (necessarily rows-only) PCA
    family: the trace identity Σ eigenvalues(cov) = Σ per-dimension
    population variance. The left side comes from the distributed
    partial-Gram PCA (`train_pca`, k = d so ALL eigenvalues — driver
    state stays d²); the right side is the same exact-decimal moments
    path `sim_embedding_moments` oracles, summed through DECIMAL so
    both engines agree bit-for-bit. The query emits the exact total
    variance plus ``eig_sum_matches`` = |Σλ − total| < 1e-6 — the
    eigendecomposition's correctness rides the hash as a checked
    boolean (float64 Gram accumulation error is ~1e-10 here, four
    orders inside the tolerance). Converts a rows-only family member
    into a driver-verified exact oracle (VERDICT r5 task 6)."""
    import numpy as np

    from metricproxy_spark.operators.pca import train_pca

    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    _, _, evals = train_pca(emb, "embedding", k=d)
    eig_sum = float(np.sum(evals))
    comp = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "v"
        )
    )
    agg = comp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,9)")).cast("double").alias("sv"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,18)"))
        .cast("double")
        .alias("svv"),
    )
    pervar = agg.select(
        "n",
        (
            F.col("svv") / F.col("n")
            - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n"))
        )
        .cast("decimal(27,9)")
        .alias("var_dec"),
    )
    return pervar.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.min("n").cast("bigint").alias("n_vectors"),
        F.sum("var_dec").cast("double").alias("total_variance"),
        (
            F.abs(F.sum("var_dec").cast("double") - F.lit(eig_sum)) < 1e-6
        ).alias("eig_sum_matches"),
    )


@register("sim_pca_project")
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: PCA dimensionality reduction — fit 4 principal components
    with the distributed partial-Gram reduction (one d²-sized partial
    per partition; driver state is d², never n) and project every
    vector map-only. Registered rows-only: eigendecomposition has no
    DuckDB twin; tests/test_pca.py pins orthonormality, variance
    ordering vs sim_embedding_moments, reconstruction-error descent,
    and stability across repartitionings."""
    from metricproxy_spark.operators.pca import project_pca, train_pca

    emb = load_table(spark, sf_dir, "embeddings")
    comps, mean, _ = train_pca(emb, "embedding", k=4)
    return project_pca(emb, comps, mean, "embedding").select(
        "vec_id", "label", "pc1", "pc2", "pc3", "pc4"
    )
