"""Time-band (range) join (X8): pair left rows with right rows whose
timestamp falls in [left.ts, left.ts + band].

Scale design: a raw theta join is a broadcast-nested-loop — O(|L|·|R|)
comparisons, catastrophic at fact-table scale. Bucketing turns it into
an equi-join: assign each left row to its time bucket, replicate each
right row into the (at most two) buckets a band-window starting up to
``band`` earlier could live in, join on the bucket key, then apply the
exact band predicate as a residual filter. Shuffles both sides once on
the bucket key; bucket width = band keeps replication ≤ 2x. This is
the standard interval-join decomposition (Flink's interval join /
Spark's recommended range-join pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_band_join(
    left: DataFrame,
    right: DataFrame,
    band_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    extra_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join where ``right.ts ∈ [left.ts, left.ts + band_seconds]``.

    ``left_ts`` and ``right_ts`` must be distinct names (rename before
    calling); other column collisions must also be resolved by the
    caller. ``extra_on``: additional predicate applied with the band
    residual.

    Only ``inner`` and ``left`` modes are supported: the right side is
    replicated into two buckets via explode, so right/full outer would
    surface each unmatched right row once per replica. Dedup the
    replicas first if outer-right semantics are ever needed.
    """
    if left_ts == right_ts:
        raise ValueError("rename ts columns to distinct names before joining")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"time_band_join supports how='inner'|'left' only, got {how!r} "
            "(right rows are bucket-replicated; outer-right would duplicate)"
        )
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c)) / F.lit(band_seconds))  # noqa: E731

    l_b = left.withColumn("_lbucket", bucket(left_ts))
    # A right row at time t can match left rows bucketed at floor(t/band)
    # or the bucket before (left.ts ≤ t ≤ left.ts + band).
    r_b = right.withColumn(
        "_rbucket", F.explode(F.array(bucket(right_ts), bucket(right_ts) - 1))
    )
    band_pred = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {band_seconds} SECONDS")
    )
    cond = (F.col("_lbucket") == F.col("_rbucket")) & band_pred
    if extra_on is not None:
        cond = cond & extra_on
    return l_b.join(r_b, cond, how).drop("_lbucket", "_rbucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """Join interval rows that OVERLAP: ``l_start <= r_end AND
    r_start <= l_end`` (closed intervals, integer endpoints — convert
    timestamps to epoch units first).

    Both sides carry intervals (unlike :func:`time_band_join`, where
    the right side is a point), so BOTH are replicated: each row lands
    in every bucket its interval spans (``sequence`` + ``explode``,
    ≤ len/width + 1 replicas), the join is an equi-join on the bucket
    key, and the exact overlap predicate runs as a residual filter.

    Exactly-once without a distinct: a pair that overlaps across
    several shared buckets is emitted ONLY from the bucket containing
    ``greatest(l_start, r_start)`` — the overlap's first point, which
    lies in exactly one bucket. This replaces the usual
    ``dropDuplicates`` (a second full shuffle) with a free residual
    comparison.

    Scale: shuffles each side once on the bucket key; pick
    ``bucket_width`` near the typical interval length to keep
    replication ~2x. With an ``extra_on`` equi-column folded into the
    join key space, per-task work is bounded by the densest
    (key, bucket) cell — the operator degrades linearly in local
    interval density, never in |L|·|R|.
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive integer")
    for name in (l_start, l_end):
        if name in (r_start, r_end):
            raise ValueError("rename endpoint columns to distinct names")

    def buckets(start: str, end: str) -> Column:
        return F.explode(
            F.sequence(
                F.floor(F.col(start) / w).cast("long"),
                F.floor(F.col(end) / w).cast("long"),
            )
        )

    l_b = left.withColumn("_lbucket", buckets(l_start, l_end))
    r_b = right.withColumn("_rbucket", buckets(r_start, r_end))
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    first_bucket = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / w
    ).cast("long")
    cond = (
        (F.col("_lbucket") == F.col("_rbucket"))
        & overlap
        & (first_bucket == F.col("_lbucket"))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return l_b.join(r_b, cond, "inner").drop("_lbucket", "_rbucket")
