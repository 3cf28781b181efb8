"""Windowed streaming transforms (SURVEY §3.7 T1–T5).

These generalize the reference's only aggregation — the periodic stats
loop that rolls per-component counters into new datapoints every
``StatsDelay`` [P: main.go — stats loop; golib dpsink/counter.go] —
into the standard streaming-window family. Each transform works on both
batch and streaming DataFrames (Spark's unified semantics), which is
how the driver's DuckDB oracle can check the streamed results: run the
same transform over a file stream with ``availableNow`` and compare the
final table against batch SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_stats(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    length: str = "5 minutes",
) -> DataFrame:
    """T1: tumbling-window count/sum per key — the A2 stats rollup."""
    return (
        df.groupBy(F.window(ts_col, length).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sliding_stats(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    length: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """T2: sliding-window moving counts (each event lands in
    length/slide windows)."""
    return (
        df.groupBy(F.window(ts_col, length, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """T3: session windows per key with an inactivity gap. In streaming
    mode a watermark is required (state must be boundable — T4)."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def watermarked_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T4+T5: exactly the reference's "same datapoint delivered twice"
    guard, with state bounded by the watermark (a duplicate arriving
    later than the watermark interval is no longer caught — that is the
    documented trade for bounded state at 100 TB/day volumes)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
