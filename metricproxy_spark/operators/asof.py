"""As-of join (X9): for each left row, the most recent right row at or
before its timestamp, per key.

The reference has no joins at all; this is the time-series alignment
primitive its domain implies (e.g. enriching a datapoint with the
latest prior registry/event state).

Scale design: the naive formulations — per-row correlated subquery, or
an inequality join + row_number — are respectively driver-bound and
shuffle-explosive (the inequality join materializes every candidate
pair before ranking). Instead we union both sides and run ONE window
pass partitioned by key:

    sort (key, ts, side) → last(right_payload, ignorenulls) over
    rows unbounded preceding → keep left rows

One shuffle on key, state bounded by partition sort — the classic
distributed as-of pattern (same shape Flink/KDB piecewise joins use).
Right rows sort before left rows at equal ts, giving `>=` (inclusive)
as-of semantics, matching DuckDB's ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: left rows enriched with the latest right payload
    where ``right.ts <= left.ts``, per ``on`` key (null when none).

    ``right_payload``: right columns to carry (default: all but key/ts).
    If multiple right rows share (key, ts), pre-aggregate first — the
    survivor is otherwise unspecified (same caveat as DuckDB ASOF).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, ts_col)]

    # Carry the ENTIRE right payload as one struct and forward-fill that
    # struct with a single last(ignorenulls=True): the latest right row
    # travels atomically, NULL payload fields included. (Filling each
    # column independently would stitch a composite row that never
    # existed whenever the latest right row has a legit NULL in one
    # column — diverging from DuckDB ASOF JOIN semantics.)
    rhs = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_asof_p"),
    )
    struct_type = rhs.schema["_asof_p"].dataType
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof_p", F.lit(None).cast(struct_type)
    )
    # Align schemas: right side gets nulls for left-only columns.
    left_only = [c for c in lhs.columns if c not in rhs.columns]
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))

    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_asof_p", F.last("_asof_p", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1)
    for c in right_payload:
        out = out.withColumn(f"{c}{suffix}", F.col("_asof_p")[c])
    return out.drop("_side", "_asof_p")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: left rows enriched with the EARLIEST right
    payload where ``right.ts >= left.ts``, per ``on`` key (null when
    none) — the look-ahead alignment (e.g. "the next deploy after this
    alert"). Same single-shuffle union+window shape as
    :func:`asof_join`, with the scan order mirrored: descending ts, so
    the forward-fill carries the smallest qualifying right timestamp;
    right still sorts before left at equal ts, giving inclusive ``>=``
    — matching ``ASOF JOIN ... ON l.ts <= r.ts`` in DuckDB."""
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, ts_col)]
    rhs = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_asof_p"),
    )
    struct_type = rhs.schema["_asof_p"].dataType
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof_p", F.lit(None).cast(struct_type)
    )
    left_only = [c for c in lhs.columns if c not in rhs.columns]
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_asof_p", F.last("_asof_p", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1)
    for c in right_payload:
        out = out.withColumn(f"{c}{suffix}", F.col("_asof_p")[c])
    return out.drop("_side", "_asof_p")
