"""IVF-PQ (IVFADC) approximate nearest neighbour index (SURVEY §3.8 L3
extension — engine territory; the reference proxy has no ML surface).

The composition FAISS popularized (Jégou, Douze & Schmid, TPAMI 2011,
§IV "IVFADC"): a coarse k-means quantizer partitions the corpus into
``kc`` inverted lists, and each vector's RESIDUAL from its coarse
centroid is product-quantized to ``m`` small codes. A query probes only
the ``nprobe`` nearest lists and ranks their codes by asymmetric
distance — so search touches ``~nprobe/kc`` of the corpus and reads
bytes, not floats.

Built entirely from the repo's existing distributed pieces:

- coarse quantizer = :func:`operators.kmeans.train_kmeans` (spherical
  Lloyd; broadcast-join assignment, k·d-bounded recompute shuffle);
- residual codebooks = :func:`operators.pq.train_pq_codebooks`
  (grouped Lloyd over all subspaces in one job per iteration);
- encode/search mirror :func:`operators.pq.pq_encode` /
  :func:`operators.pq.pq_adc_topk` (narrow mapInPandas; partition-local
  top-k, final shuffle O(k_top · partitions · n_queries)).

Scale shape at 100 TB:

- The index payload per vector is ``(coarse_id:int, codes:m bytes)`` —
  16–64× smaller than the float column; lists can be made partition-
  local with ``codes.repartition(kc, "coarse_id")`` (or written
  partitioned by ``coarse_id``) so a probe prunes whole files.
- Driver/broadcast state is kc·d (coarse) + k·d (codebooks) + the
  per-query nprobe·m·k ADC tables — all corpus-size-independent.
- The probe filter (``coarse_id IN probes``) is a plain Catalyst
  predicate: it reaches the scan, so un-probed lists are never read.

Determinism: both trainers are RNG-free (id-hash-spread init), ties
break on the lowest id, ADC scores rounded to 6dp — the family
contract, so results are stable across runs and engines.

Inputs are assumed unit-norm (the spherical-k-means contract shared
with ``ivf_topk``): for unit vectors cosine and L2 rank identically,
which keeps coarse assignment (cosine) and ADC (L2 on residuals)
consistent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metricproxy_spark.operators.kmeans import train_kmeans
from metricproxy_spark.operators.pq import pq_encode, train_pq_codebooks
from metricproxy_spark.operators.similarity import assign_centroids


def _np():
    import numpy as np

    return np


@dataclass
class IvfPqIndex:
    """The bounded (driver-safe) index state plus the distributed codes.

    ``coarse``    — list[kc][d] centroid vectors (row i = centroid_id i)
    ``codebooks`` — list[m][k][d/m] residual sub-codebooks
    ``codes``     — DataFrame (id, coarse_id int, codes array<int>)
    """

    coarse: list[list[float]]
    codebooks: list[list[list[float]]]
    codes: DataFrame
    id_col: str


def build_ivfpq(
    vectors: DataFrame,
    kc: int = 8,
    m: int = 8,
    k: int = 16,
    coarse_iter: int = 8,
    pq_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfPqIndex:
    """Train coarse centroids, assign, PQ-encode residuals.

    Three bounded-driver phases; the corpus itself only flows through
    broadcast-join assignment and narrow mapInPandas encoding (plus the
    k·d-bounded training shuffles documented in kmeans/pq).
    """
    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )

    centroids = train_kmeans(
        base, k=kc, max_iter=coarse_iter, id_col=id_col, vec_col="_vec"
    )
    # train_kmeans keeps the init ids as centroid_id; re-label to dense
    # 0..kc-1 (order by original id — deterministic) so coarse row i of
    # the collected matrix IS centroid_id i everywhere downstream.
    rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    coarse = [list(r["centroid_vec"]) for r in rows]
    relabel = {r["centroid_id"]: i for i, r in enumerate(rows)}
    cdf = spark.createDataFrame(
        [(i, coarse[i]) for i in range(len(coarse))],
        "centroid_id int, centroid_vec array<double>",
    )

    # assign_centroids drops centroid_vec; broadcast-join it back for
    # the residual computation (kc rows — broadcast, no shuffle).
    assigned = assign_centroids(base, cdf, id_col, "_vec", nprobe=1).join(
        F.broadcast(cdf), "centroid_id"
    )
    residuals = assigned.select(
        F.col(id_col),
        F.col("centroid_id").cast("int").alias("coarse_id"),
        F.zip_with(
            F.col("_vec"), F.col("centroid_vec"), lambda a, b: a - b
        ).alias("_res"),
    )
    # relabel is only needed if train_kmeans ids weren't dense already
    if any(relabel[c] != c for c in relabel):
        mapping = F.create_map(
            *[F.lit(x) for pair in relabel.items() for x in pair]
        )
        residuals = residuals.withColumn(
            "coarse_id", mapping[F.col("coarse_id")].cast("int")
        )

    # The residual lineage (broadcast-join assignment + rank window)
    # re-executes for every PQ training iteration, the encode pass and
    # the codes join without this; persist materializes it once.
    residuals = residuals.persist()

    books = train_pq_codebooks(
        residuals, m=m, k=k, max_iter=pq_iter, id_col=id_col, vec_col="_res"
    )
    codes = pq_encode(residuals, books, id_col=id_col, vec_col="_res").join(
        residuals.select(id_col, "coarse_id"), id_col
    )
    return IvfPqIndex(
        coarse=coarse, codebooks=books, codes=codes, id_col=id_col
    )


def ivfpq_adc_topk(
    queries: DataFrame,
    index: IvfPqIndex,
    k_top: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest lists per query and rank their codes
    by asymmetric distance (residual-aware: one ADC table per
    (query, probed centroid) pair, built from the query's residual
    against THAT centroid).

    Output: (query_id, neighbor_id, adc_dist, rank), rank 1 nearest,
    ties on neighbor id. The ``coarse_id IN probes`` predicate is plain
    Catalyst — with codes stored partitioned by list it prunes scans.
    """
    np = _np()
    spark = queries.sparkSession
    q_rows = queries.select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    ).collect()  # bounded by contract: the query side is small

    C = np.asarray(index.coarse)  # (kc, d)
    books = np.asarray(index.codebooks)  # (m, k, dsub)
    mm, kk, dd = books.shape

    tables: dict[int, dict[int, list[list[float]]]] = {}
    probe_set: set[int] = set()
    for r in q_rows:
        qv = np.asarray(r["_qvec"])
        cd = ((C - qv[None, :]) ** 2).sum(1)
        probes = np.lexsort((np.arange(len(C)), cd))[:nprobe]
        per_probe = {}
        for p in probes:
            qr = qv - C[p]  # residual vs the probed centroid
            t = np.empty((mm, kk))
            for j in range(mm):
                t[j] = (
                    (books[j] - qr[j * dd : (j + 1) * dd][None, :]) ** 2
                ).sum(-1)
            per_probe[int(p)] = t.tolist()
            probe_set.add(int(p))
        tables[r["_qid"]] = per_probe
    bc = spark.sparkContext.broadcast(tables)

    idc = index.id_col
    pruned = index.codes.where(
        F.col("coarse_id").isin(sorted(probe_set))
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        npl = _np()
        tabs = {
            q: {p: npl.asarray(t) for p, t in per.items()}
            for q, per in bc.value.items()
        }
        for pdf in batches:
            if not len(pdf):
                continue
            c = npl.asarray(list(pdf["codes"]), dtype=npl.int64)  # (n, m)
            coarse_ids = pdf["coarse_id"].to_numpy()
            ids = pdf[idc].to_numpy()
            cols = npl.arange(c.shape[1])
            out_q, out_i, out_d = [], [], []
            for q, per in tabs.items():
                for p, t in per.items():
                    sel = coarse_ids == p
                    if not sel.any():
                        continue
                    dist = t[cols, c[sel]].sum(1)
                    sid = ids[sel]
                    order = npl.lexsort((sid, dist))[:k_top]
                    out_q.extend([q] * len(order))
                    out_i.extend(sid[order].tolist())
                    out_d.extend(dist[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_i, "adc_dist": out_d}
            )

    partial = pruned.mapInPandas(
        local_topk, "query_id long, neighbor_id long, adc_dist double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
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


def save_ivfpq(index: IvfPqIndex, path: str) -> None:
    """Persist the index as durable artifacts: the bounded state
    (coarse centroids + codebooks + id column name) as one JSON file,
    the codes as parquet PARTITIONED BY inverted list — so a later
    probe's ``coarse_id IN (...)`` prunes whole list directories at
    the storage layer (tested in test_ivfpq.py)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {
                "coarse": index.coarse,
                "codebooks": index.codebooks,
                "id_col": index.id_col,
            },
            fh,
        )
    index.codes.write.mode("overwrite").partitionBy("coarse_id").parquet(
        os.path.join(path, "codes")
    )


def load_ivfpq(spark, path: str) -> IvfPqIndex:
    """Reload a saved index: bounded state from JSON, codes as a
    partition-pruned parquet scan. The returned index serves
    :func:`ivfpq_adc_topk` identically to the freshly-built one."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return IvfPqIndex(
        coarse=meta["coarse"],
        codebooks=meta["codebooks"],
        codes=codes,
        id_col=meta["id_col"],
    )
