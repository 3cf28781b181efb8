"""Skew & co-location techniques (SURVEY §3.8 L6, §5).

AQE handles most skew automatically (``skewJoin.enabled``), but two
manual techniques remain worth having as first-class operators for the
100 TB plans where the optimizer can't see the skew coming:

- **Salted two-phase aggregation**: a groupBy on a handful of hot keys
  (e.g. per-metric-type counters where one type is 90 % of traffic)
  puts each hot key on ONE reducer. Salting splits every key into
  ``n_salt`` partial groups, aggregates, then combines partials —
  algebraic aggregates (sum/count/min/max) are exact under the split.
- **Salted replicate join**: a fact⋈dim equi-join where a few dim keys
  dominate the fact side. The dim side is replicated ``n_salt`` times
  (bounded: n_salt × |dim|), the fact side picks a deterministic salt
  per row, and the join key becomes (key, salt) — every hot key now
  spreads over n_salt reducers. Result-set identical to the plain join.

Both are pure DataFrame compositions — results stay oracle-checkable
against the unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str = "n",
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy: SUM/COUNT per ``keys``.

    Phase 1 groups by (keys, salt) — hot keys fan out over ``n_salt``
    reducers; phase 2 combines the ≤ n_salt partials per key (tiny).
    ``sum_cols`` maps output alias -> decimal-cast input expression so
    the combine stays exact (sums of decimals re-sum losslessly).
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(n_salt))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pn"),
            *[
                F.sum(F.col(src).cast("decimal(27,4)")).alias(f"_ps_{alias}")
                for alias, src in sum_cols.items()
            ],
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_pn").alias(count_alias),
        *[
            F.sum(f"_ps_{alias}").cast("double").alias(alias)
            for alias in sum_cols
        ],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-safe fact⋈dim inner equi-join on ``key``.

    The dim side explodes ×``n_salt`` (bounded replication — dim is the
    small side by contract); each fact row deterministically picks one
    salt bucket, so a hot key's fact rows spread across ``n_salt``
    shuffle partitions instead of one. Output = plain inner join.
    """
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salted = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)),
    )
    joined = fact_salted.join(dim_rep, [key, "_salt"], "inner")
    return joined.drop("_salt")


def guarded_series(
    df,
    keys: list,
    order_cols: list[str],
    *,
    guard_rows: int = 2_000_000,
    on_overflow: str = "error",
    extra_aggs: tuple = (),
):
    """Per-group sorted series (``rows`` array of structs) with a
    GROUP-SIZE GUARD for the sequential-recurrence family (EMA, Holt,
    CUSUM): their ordered fold is inherently one buffer per group, so
    memory is bounded by the largest group — fine at metrics cadences
    (one (type, day) group ≈ 10⁴–10⁶ points), fatal for a hot key at
    ~10⁸ events/day. The guard makes that bound explicit instead of an
    executor OOM:

    - ``on_overflow='error'``: the collect runs as one hash agg; a
      group exceeding ``guard_rows`` raises in-plan (raise_error) with
      the group size in the message. The default — loud, no silent
      bias. The guard must sit well under the executor-memory bound,
      since the array materializes before the check.
    - ``on_overflow='cap'``: rows are ranked per group with a window
      (sort state SPILLS to disk, unlike collect_list's in-memory
      buffer) and only the first ``guard_rows`` in ``order_cols``
      order are folded — deterministic truncation, documented bias,
      OOM-safe for arbitrarily hot keys.

    Returns the grouped frame with ``rows`` (sorted struct array) and
    ``group_n`` (the TRUE group size, pre-cap).
    """
    if on_overflow not in ("error", "cap"):
        raise ValueError(f"on_overflow must be error or cap: {on_overflow!r}")
    struct = F.struct(*order_cols)
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    if on_overflow == "cap":
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(*order_cols)
        ranked = df.withColumn("_rn", F.row_number().over(w))
        return (
            ranked.groupBy(*key_cols)
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rn") <= guard_rows, struct)
                    )
                ).alias("rows"),
                F.count(F.lit(1)).cast("bigint").alias("group_n"),
                *extra_aggs,
            )
        )
    grouped = df.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(struct)).alias("rows"),
        F.count(F.lit(1)).cast("bigint").alias("group_n"),
        *extra_aggs,
    )
    return grouped.withColumn(
        "rows",
        F.when(F.col("group_n") <= guard_rows, F.col("rows")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "recurrence group exceeds guard_rows="
                        f"{guard_rows}: size="
                    ),
                    F.col("group_n").cast("string"),
                    F.lit(
                        "; use on_overflow='cap' or a finer grouping key"
                    ),
                )
            )
        ),
    )


def guarded_wire_payload(df, guard_rows: int = 100_000):
    """Driver-side LOAD-GENERATOR guard (r6 VERDICT task 6): the
    live-listener queries synthesize their wire payload on the client
    side of the socket — a documented, intentionally driver-local
    collect. Nothing bounded it, though: a future caller pointing one
    at a fact table would OOM the driver silently. This collects
    through ``limit(guard_rows + 1)`` — the scan stops at the bound,
    so even the failure path moves O(guard_rows), not the table — and
    raises loudly past the guard instead of materializing further.

    Returns the collected rows (callers pick their column)."""
    rows = df.limit(guard_rows + 1).collect()
    if len(rows) > guard_rows:
        raise ValueError(
            f"wire-payload synthesis exceeds guard_rows={guard_rows}: "
            "load generators are driver-local by design; point the "
            "listener pipeline at a bounded subset, or raise the guard "
            "deliberately"
        )
    return rows


def guarded_wire_pandas(df, guard_rows: int = 100_000):
    """``guarded_wire_payload`` for the toPandas-shaped synthesis
    sites (HTTP request bodies grouped client-side)."""
    pdf = df.limit(guard_rows + 1).toPandas()
    if len(pdf) > guard_rows:
        raise ValueError(
            f"wire-payload synthesis exceeds guard_rows={guard_rows}: "
            "load generators are driver-local by design; point the "
            "listener pipeline at a bounded subset, or raise the guard "
            "deliberately"
        )
    return pdf
