"""Product quantization (PQ) for embedding columns (SURVEY §3.8 L3
extension — engine territory; the reference proxy has no ML surface).

PQ (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) splits a d-dim vector into ``m`` subvectors and
vector-quantizes each against its own ``k``-centroid codebook: a float
vector becomes ``m`` small integer codes (here 64×float32 → 8 bytes,
32× smaller), and query-to-corpus distances are approximated from a
per-query lookup table without ever touching the original floats
(asymmetric distance computation, ADC).

Scale shape (what must survive 100 TB):

- Codebooks are ``m·k·(d/m) = k·d`` floats — driver/broadcast bounded,
  the same contract as the k-means centroid matrix; the corpus never
  leaves the executors.
- Training is a grouped Lloyd loop over ALL subspaces at once: one
  Arrow-batched assignment pass per iteration plus one hash agg whose
  key space is (m·k·d/m) regardless of corpus size (map-side combine).
- Encoding is a narrow mapInPandas pass: numpy argmin over k per
  subspace, no shuffle.
- ADC top-k mirrors the BLAS top-k shape: partition-local heaps, a
  final shuffle of O(k_top · partitions · n_queries) id/score pairs.

Determinism: init = k id-hash-spread subvectors (no RNG), L2 assignment
ties break on the lowest code, scores rounded to 6dp — consistent with
the rest of the similarity family.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _np():
    import numpy as np

    return np


def _codebook_array(codebooks: Sequence[Sequence[Sequence[float]]]):
    """list[m][k][dsub] → numpy (m, k, dsub) float64."""
    np = _np()
    return np.asarray(codebooks, dtype=np.float64)


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    max_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks with a grouped Lloyd loop.

    All m subspaces train in ONE distributed job per iteration: the
    assignment pass encodes every row against the current codebooks
    (Arrow-batched numpy), and the recompute pass is a single hash agg
    over (subspace, code, dim) — k·d keys total, so the shuffle is
    constant-size no matter the corpus. Only codebooks (k·d floats)
    ever reach the driver.
    """
    np = _np()
    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )
    d = len(base.select("_vec").first()["_vec"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m

    # deterministic init: k vectors picked by hashing the id — a fixed
    # pseudo-random sample that spreads seeds across clusters even when
    # ids correlate with cluster membership (the lowest-k-ids init
    # collapsed every codebook into one cluster on clustered corpora).
    # xxhash64 is a deterministic JVM-side function: no RNG, same seeds
    # on every run, and the pick is a LIMIT over a sort — scan-cheap.
    seed_rows = (
        base.orderBy(F.xxhash64(F.col("_vid")).asc(), F.col("_vid").asc())
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors to train k={k} codebooks")
    seed = np.asarray([r["_vec"] for r in seed_rows])  # (k, d)
    books = np.stack(
        [seed[:, j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, k, dsub)

    sums_schema = "sub int, code int, pos int, s double, n long"
    for _ in range(max_iter):
        bc = spark.sparkContext.broadcast(books.tolist())

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            npb = _np().asarray(bc.value)  # (m, k, dsub)
            mm, kk, dd = npb.shape
            for pdf in batches:
                x = _np().asarray(list(pdf["_vec"]))  # (n, d)
                out = {"sub": [], "code": [], "pos": [], "s": [], "n": []}
                for j in range(mm):
                    xs = x[:, j * dd : (j + 1) * dd]  # (n, dsub)
                    # ||x - c||² argmin; ties -> lowest code via argmin
                    d2 = ((xs[:, None, :] - npb[j][None, :, :]) ** 2).sum(-1)
                    code = d2.argmin(1)  # (n,)
                    # partial sums per (code, dim) for the mean update
                    for c in _np().unique(code):
                        sel = xs[code == c]
                        out["sub"].extend([j] * dd)
                        out["code"].extend([int(c)] * dd)
                        out["pos"].extend(range(dd))
                        out["s"].extend(sel.sum(0).tolist())
                        out["n"].extend([sel.shape[0]] * dd)
                yield pd.DataFrame(out)

        agg = (
            base.mapInPandas(partials, sums_schema)
            .groupBy("sub", "code", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = books.copy()  # empty clusters keep previous centroid
        for r in agg:
            new[r["sub"], r["code"], r["pos"]] = r["s"] / r["n"]
        if np.allclose(new, books, atol=1e-7):
            books = new
            break
        books = new
    return books.tolist()


def pq_encode(
    vectors: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes ARRAY<INT> of length m).
    Narrow mapInPandas — no shuffle; codes are the 32×-compressed
    representation downstream ADC search runs on."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(list(codebooks))
    base = vectors.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        np = _np()
        npb = np.asarray(bc.value)
        mm, kk, dd = npb.shape
        for pdf in batches:
            x = np.asarray(list(pdf["_vec"]))
            codes = np.empty((x.shape[0], mm), dtype=np.int32)
            for j in range(mm):
                xs = x[:, j * dd : (j + 1) * dd]
                d2 = ((xs[:, None, :] - npb[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes.tolist())}
            )

    return base.mapInPandas(encode, f"{id_col} long, codes array<int>")


def pq_decode_error(
    vectors: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector squared reconstruction error ‖x − decode(encode(x))‖²
    — the quantity PQ training minimizes; used by tests to prove the
    trained codebooks beat degenerate ones."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(list(codebooks))
    base = vectors.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )

    def err(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        np = _np()
        npb = np.asarray(bc.value)
        mm, kk, dd = npb.shape
        for pdf in batches:
            x = np.asarray(list(pdf["_vec"]))
            e = np.zeros(x.shape[0])
            for j in range(mm):
                xs = x[:, j * dd : (j + 1) * dd]
                d2 = ((xs[:, None, :] - npb[j][None, :, :]) ** 2).sum(-1)
                e += d2.min(1)
            yield pd.DataFrame({id_col: pdf[id_col], "sq_err": e})

    return base.mapInPandas(err, f"{id_col} long, sq_err double")


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    k_top: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, build the (m, k) table of
    exact query-subvector→centroid squared distances, then score every
    PQ code by m table lookups — the corpus floats are never read.

    Output: (query_id, neighbor_id, adc_dist, rank), rank 1 = nearest,
    ties broken on neighbor id. Partition-local top-k keeps the final
    shuffle at O(k_top · partitions · n_queries) rows.
    """
    np = _np()
    spark = queries.sparkSession
    q_rows = queries.select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    ).collect()  # bounded by contract: the query side is small
    npb = np.asarray(list(codebooks))
    mm, kk, dd = npb.shape
    tables = {}
    for r in q_rows:
        qv = np.asarray(r["_qvec"])
        t = np.empty((mm, kk))
        for j in range(mm):
            t[j] = ((npb[j] - qv[j * dd : (j + 1) * dd][None, :]) ** 2).sum(-1)
        tables[r["_qid"]] = t
    bc = spark.sparkContext.broadcast({q: t.tolist() for q, t in tables.items()})

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        npl = _np()
        tabs = {q: npl.asarray(t) for q, t in bc.value.items()}
        for pdf in batches:
            if not len(pdf):
                continue
            c = npl.asarray(list(pdf["codes"]), dtype=npl.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_d = [], [], []
            cols = npl.arange(c.shape[1])
            for q, t in tabs.items():
                dist = t[cols, c].sum(1)  # (n,) via (m,k) fancy lookup
                order = npl.lexsort((ids, dist))[: k_top]
                out_q.extend([q] * len(order))
                out_i.extend(ids[order].tolist())
                out_d.extend(dist[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_i, "adc_dist": out_d}
            )

    partial = codes.mapInPandas(
        local_topk, "query_id long, neighbor_id long, adc_dist double"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc_dist", 6).alias("adc_dist"),
            "rank",
        )
    )
