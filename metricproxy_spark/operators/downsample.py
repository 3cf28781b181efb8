"""Largest-Triangle-Three-Buckets downsampling (engine extension to
the §3.5/§3.8 time-series family — the other classic charting
downsampler next to M4).

LTTB (Steinarsson 2013, public thesis/reference implementations):
partition the series into ``n_out - 2`` equal buckets, always keep the
first and last points, and from each bucket keep the point forming the
largest triangle with the PREVIOUSLY kept point and the NEXT bucket's
average — preserving visual shape where M4 preserves extremes.

The selection is sequential per series (each kept point depends on the
previous), so the Spark shape is one ``applyInPandas`` per series key
— embarrassingly parallel ACROSS series (at scale: millions of
series × bounded points-per-series after a rollup), vectorized numpy
WITHIN a series. Deterministic: areas compare on exact float64 with
numpy argmax's first-index tie-break, and inputs sort by (ts, id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb_downsample(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    n_out: int = 100,
) -> DataFrame:
    """Per-series LTTB to ``n_out`` points: (series, ts, value, id,
    pos) where pos is the kept point's 0-based output position. Series
    with ≤ n_out points pass through unchanged (pos = input order)."""
    import pandas as pd

    import pyspark.sql.types as T

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    out_schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("point_id", T.LongType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )

    def select_points(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["_ts", "_id"]).reset_index(drop=True)
        n = len(pdf)
        series = pdf["_series"].iloc[0]
        x = pdf["_ts"].to_numpy(dtype="float64")
        y = pdf["_val"].to_numpy(dtype="float64")
        if n <= n_out:
            keep = np.arange(n)
        else:
            keep_idx = [0]
            # n_out-2 interior buckets over points 1..n-2. Integer
            # rounding of the edges can produce EMPTY buckets when n is
            # only slightly above n_out — repack greedily so every
            # bucket holds ≥1 point (there are n-2 ≥ n_out-1 interior
            # points whenever n > n_out, so packing always fits).
            bounds = np.linspace(1, n - 1, n_out - 1).astype(int)
            prev_end = 1
            for b in range(n_out - 2):
                lo = max(int(bounds[b]), prev_end)
                hi = max(int(bounds[b + 1]), lo + 1)
                hi = min(hi, n - 1)
                if lo >= n - 1:
                    break  # interior points exhausted
                prev_end = hi
                nxt_lo, nxt_hi = hi, (
                    max(int(bounds[b + 2]), hi + 1)
                    if b + 2 < len(bounds)
                    else n
                )
                ax, ay = x[keep_idx[-1]], y[keep_idx[-1]]
                bx = x[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else x[n - 1]
                by = y[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else y[n - 1]
                # triangle area ∝ |(ax-bx)(y-ay) - (ax-x)(by-ay)|
                area = np.abs(
                    (ax - bx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (by - ay)
                )
                keep_idx.append(lo + int(np.argmax(area)))
            keep_idx.append(n - 1)
            keep = np.asarray(keep_idx)
        return pd.DataFrame(
            {
                "series": series,
                "ts": pdf["_ts"].to_numpy()[keep],
                "value": pdf["_val"].to_numpy()[keep],
                "point_id": pdf["_id"].to_numpy()[keep],
                "pos": np.arange(len(keep), dtype="int32"),
            }
        )

    src = df.select(
        F.col(series_col).cast("string").alias("_series"),
        F.col(ts_col).cast("bigint").alias("_ts"),
        F.col(value_col).cast("double").alias("_val"),
        F.col(id_col).cast("bigint").alias("_id"),
    )
    return src.groupBy("_series").applyInPandas(select_points, out_schema)
