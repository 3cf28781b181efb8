"""Distributed PCA over an embedding column (L3/L5 family).

Public method (Pearson 1901 / standard data-pipeline PCA; the Spark
MLlib RowMatrix computePrincipalComponents does the same Gram-matrix
reduction): the d×d covariance is assembled from per-partition partial
Gram matrices — each task reduces its Arrow batches to ``(n, Σx,
XᵀX)`` with numpy, so the shuffle carries ONE d²-sized row per
partition instead of n vectors. The driver sums the partials (d² = 64²
doubles here — the same bounded-collect budget as kmeans' k·d
centroids), eigendecomposes, and broadcasts the top-k components back
for a map-only projection.

Scale shape at 100 TB: the reduction is a tree over partitions
(mapInPandas partials + driver sum), data never concentrates; the
only O(d²) state is the Gram matrix itself, independent of row count.
Determinism: partial sums are float64 and partition-order dependent at
the last-ulp level; eigenvectors are sign-fixed (largest-|component|
coordinate made positive) and projections rounded, so results are
stable to well below the rounding scale for separated eigenvalues —
tested, not assumed (tests/test_pca.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


def _partial_gram(vec_col: str):
    def fn(batches):
        import numpy as _np
        import pandas as _pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n == 0:
            return
        yield _pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
        )

    return fn


def train_pca(
    emb: DataFrame, vec_col: str = "embedding", k: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA; returns (components k×d, mean d, explained_variance k).

    One pass over the data; the collect is numPartitions × d² doubles
    (bounded, data-independent — NOT a collect of rows)."""
    src = emb.select(F.col(vec_col).cast("array<double>").alias(vec_col))
    parts = src.mapInPandas(_partial_gram(vec_col), _PARTIAL_SCHEMA).collect()
    if not parts:
        raise ValueError("train_pca: empty input")
    n = sum(p.n for p in parts)
    d = len(parts[0].s)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for p in parts:
        s += np.asarray(p.s)
        g += np.asarray(p.g).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    # Sign fix: make the largest-|x| coordinate of each component
    # positive — eigenvectors are only defined up to sign.
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, evals[order]


def project_pca(
    emb: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_prefix: str = "pc",
    round_dp: int = 6,
) -> DataFrame:
    """Map-only projection onto the fitted components (broadcast k×d)."""
    spark = emb.sparkSession
    b = spark.sparkContext.broadcast(
        (components.astype(np.float64), mean.astype(np.float64))
    )
    k = components.shape[0]
    out_fields = [f for f in emb.schema.fields if f.name != vec_col]
    schema = StructType(
        out_fields
        + [StructField(f"{out_prefix}{i + 1}", DoubleType()) for i in range(k)]
    )
    other_cols = [f.name for f in out_fields]

    def fn(batches):
        import numpy as _np

        comps, mu = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            proj = _np.round((x - mu) @ comps.T, round_dp)
            out = pdf[other_cols].copy()
            for i in range(k):
                out[f"{out_prefix}{i + 1}"] = proj[:, i]
            yield out

    return emb.select(
        *other_cols, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(fn, schema)
