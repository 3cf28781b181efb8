"""Flagship + events-table queries (SURVEY Phase 1, §3.5 A1/A2).

The reference proxy's only aggregation is its internal stats loop:
every ``StatsDelay`` it emits per-component counters (datapoints
forwarded, events, errors) as new datapoints
[P: main.go — stats loop; golib dpsink/counter.go — Counter].
``events_hourly_stats`` is that same computation expressed on the
driver's ``events`` stream table: bucket by time, count and sum per
category — scan → time bucketing → hash agg.

Scale notes: single shuffle on (event_type, hour); partial aggregation
(map-side combine) happens automatically for count/sum; low-cardinality
group keys (5 types x ~720 hours) mean tiny shuffle output regardless
of input size. At 100 TB this is the canonical "metrics rollup" shape —
no skew risk worse than per-type volume imbalance, which AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.functions.aggregates import davg, davg_sql, dsum, dsum_sql
from metricproxy_spark.io import load_table
from metricproxy_spark.registry import register


@register(
    "events_hourly_stats",
    oracle=f"""
    SELECT event_type,
           date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value,
           {davg_sql('value')} AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 stats-loop analog: per-type hourly count/sum/avg over events."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        davg("value").alias("avg_value"),
    )


@register(
    "events_type_totals",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {dsum_sql('value')} AS sum_value,
           CAST(min(value) AS DOUBLE) AS min_value,
           CAST(max(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def events_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 counter analog: lifetime totals per event type (X10 hash agg,
    incl. count-distinct which adds an expand+reshuffle — acceptable on
    5 group keys)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "events_multires_rollup",
    oracle=f"""
    SELECT event_type,
           date_trunc('day', ts) AS day_ts,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN date_trunc('hour', ts) END AS hour_ts,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN 'hour' ELSE 'day' END AS resolution,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
        (event_type, date_trunc('day', ts), date_trunc('hour', ts)),
        (event_type, date_trunc('day', ts))
    )
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly AND daily
    aggregates of the same stream in ONE pass via grouping sets — the
    continuous-aggregate shape time-series stores maintain, here a
    single Expand + hash-agg (each input row expands to its 2 grouping
    rows map-side; the shuffle carries only partial aggregates, so at
    100 TB the cost is ~2× the single-resolution rollup, not 2 scans).
    A `resolution` discriminator + GROUPING() guard keeps the schema
    flat and the oracle exact."""
    ev = load_table(spark, sf_dir, "events")
    # {ev} = parameterized DataFrame substitution (unique auto-generated
    # internal name per call) — no session-global temp view to collide
    # across concurrent invocations (r11 VERDICT finding 2).
    return spark.sql(
        f"""
        SELECT event_type,
               date_trunc('day', ts) AS day_ts,
               CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                    THEN date_trunc('hour', ts) END AS hour_ts,
               CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                    THEN 'hour' ELSE 'day' END AS resolution,
               count(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM {{ev}}
        GROUP BY GROUPING SETS (
            (event_type, date_trunc('day', ts), date_trunc('hour', ts)),
            (event_type, date_trunc('day', ts))
        )
        """,
        ev=ev,
    )


@register(
    "events_gapfill_ffill",
    oracle=f"""
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               {dsum_sql('value')} AS hour_sum
        FROM events GROUP BY 1, 2
    ), b AS (
        SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
        FROM agg GROUP BY 1
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
        FROM b
    ), j AS (
        SELECT s.event_type, s.hour_ts, a.hour_sum
        FROM spine s LEFT JOIN agg a
          ON s.event_type = a.event_type AND s.hour_ts = a.hour_ts
    )
    SELECT event_type, hour_ts,
           (hour_sum IS NULL) AS is_gap,
           last_value(hour_sum IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_sum
    FROM j
    """,
)
def events_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: generate the dense hourly spine per
    series (sequence+explode — spine size is bounded by time range ×
    series count, independent of event volume), left-join the real
    hourly rollups, then forward-fill gaps with `last(...) ignore
    nulls` over an ordered window — the standard monitoring-system
    "connect the line across missing scrapes" semantics (and the
    LOCF interpolation a hypertable's gappy rollup needs). One
    shuffle for the rollup, one broadcast-able spine join, one
    window."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(dsum("value").alias("hour_sum"))
    bounds = agg.groupBy("event_type").agg(
        F.min("hour_ts").alias("mn"), F.max("hour_ts").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(mn, mx, interval 1 hour)")
        ).alias("hour_ts"),
    )
    joined = spine.join(agg, ["event_type", "hour_ts"], "left")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour_ts",
        F.col("hour_sum").isNull().alias("is_gap"),
        F.last("hour_sum", ignorenulls=True).over(w).alias("filled_sum"),
    )


@register(
    "events_ema",
    oracle="""
    WITH series AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               list(value ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type, day,
           len(vals) AS n,
           vals[1] AS first_value,
           list_reduce(vals, (acc, x) -> 0.5 * x + 0.5 * acc) AS ema
    FROM series
    """,
)
def events_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average per (event_type, day) — the smoothing
    step of an anomaly-detection rollup (the reference only counts; EMA
    is the natural next stat on the same stream shape).

    EMA is inherently sequential (each output depends on the previous),
    which bars a plain window expression — but with alpha=0.5 every step
    is ``0.5*x + 0.5*acc``: one IEEE multiply-add chain whose result is
    bit-identical across engines when folded in the same order. We
    collect each bounded per-(type, day) series as a sorted array and
    fold it with the ``aggregate`` HOF — JVM-side, no Python. Grouping
    by day bounds series length (no unbounded collect_list): at 100 TB
    the state per group is one day of one key, and a second pass can
    chain day-level EMAs via the same fold if cross-day carry is needed.
    MEMORY BOUND: one array buffer per (type, day) group — fine at
    metrics cadences, so a hot key at ~10⁸ events/day goes through
    :func:`~metricproxy_spark.operators.scale.guarded_series`, which
    raises in-plan past guard_rows (or spills+caps in 'cap' mode)
    instead of OOMing an executor.
    The DuckDB oracle is the identical fold via list_reduce, so the
    sequential semantics — not just aggregates — are value-checked.
    """
    from metricproxy_spark.operators.scale import guarded_series

    events = load_table(spark, sf_dir, "events")
    series = guarded_series(
        events,
        ["event_type", F.date_trunc("day", "ts").alias("day")],
        ["ts", "event_id", "value"],
    )
    # Stage the sorted value array in its own projection so the fold
    # below references one attribute (CollapseProject would otherwise
    # re-embed the sort per use).
    staged = series.select(
        "event_type",
        "day",
        F.expr("transform(rows, r -> r.value)").alias("vals"),
    )
    return staged.select(
        "event_type",
        "day",
        F.size("vals").cast("bigint").alias("n"),
        F.element_at("vals", 1).alias("first_value"),
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
            " (acc, x) -> 0.5D * x + 0.5D * acc)"
        ).alias("ema"),
    )


@register(
    "events_interpolate_linear",
    oracle=f"""
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               {dsum_sql('value')} AS hour_sum
        FROM events GROUP BY 1, 2
    ), b AS (
        SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
        FROM agg GROUP BY 1
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
        FROM b
    ), j AS (
        SELECT s.event_type, s.hour_ts, a.hour_sum
        FROM spine s LEFT JOIN agg a
          ON s.event_type = a.event_type AND s.hour_ts = a.hour_ts
    ), ctx AS (
        SELECT event_type, hour_ts, hour_sum,
               last_value(hour_sum IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN hour_sum IS NOT NULL THEN hour_ts END
                          IGNORE NULLS) OVER w_prev AS pt,
               first_value(hour_sum IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN hour_sum IS NOT NULL THEN hour_ts END
                           IGNORE NULLS) OVER w_next AS nt
        FROM j
        WINDOW w_prev AS (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour_ts,
           (hour_sum IS NULL) AS is_gap,
           CASE WHEN hour_sum IS NOT NULL THEN hour_sum
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(epoch(hour_ts) - epoch(pt) AS DOUBLE)
                        / CAST(epoch(nt) - epoch(pt) AS DOUBLE))
           END AS filled_sum
    FROM ctx
    """,
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling by LINEAR interpolation (the companion
    to LOCF in events_gapfill_ffill): a missing hour gets the value on
    the straight line between its last and next observed neighbors,
    weighted by time distance; leading/trailing gaps fall back to the
    nearest observed value.

    Same scale shape as the LOCF query — spine size is bounded by
    time-range x series count, two ordered windows over the spine (one
    per direction), never over raw events. The interpolation
    arithmetic is a fixed IEEE expression over identical operands, so
    the oracle matches bit-for-bit despite the doubles.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(dsum("value").alias("hour_sum"))
    bounds = agg.groupBy("event_type").agg(
        F.min("hour_ts").alias("mn"), F.max("hour_ts").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias(
            "hour_ts"
        ),
    )
    j = spine.join(agg, ["event_type", "hour_ts"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("hour_sum").isNotNull(), F.col("hour_ts"))
    ctx = j.select(
        "event_type",
        "hour_ts",
        "hour_sum",
        F.last("hour_sum", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_ts, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("hour_sum", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_ts, ignorenulls=True).over(w_next).alias("nt"),
    )
    frac = (
        (F.unix_timestamp("hour_ts") - F.unix_timestamp("pt")).cast("double")
        / (F.unix_timestamp("nt") - F.unix_timestamp("pt")).cast("double")
    )
    return ctx.select(
        "event_type",
        "hour_ts",
        F.col("hour_sum").isNull().alias("is_gap"),
        F.when(F.col("hour_sum").isNotNull(), F.col("hour_sum"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("filled_sum"),
    )


@register(
    "events_series_correlation",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), paired AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.v AS x, b.v AS y
        FROM hourly a JOIN hourly b ON a.h = b.h
         AND a.event_type < b.event_type
    ), sums AS (
        SELECT type_a, type_b, count(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(27,4)) * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(27,4)) * CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(27,4)) * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS syy
        FROM paired GROUP BY 1, 2
    )
    SELECT type_a, type_b, n,
           (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
    FROM sums
    """,
)
def events_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series similarity: Pearson correlation between every pair
    of per-type hourly series — "which metrics move together", the
    first question a metrics store gets asked across series.

    Exactness through the same decimal-power-sum machinery as the
    moments query: all five sums are order-independent DECIMAL
    aggregates (the hourly inputs are 4dp-exact doubles, so products
    are 8dp-exact and in range), and the final correlation is one
    fixed IEEE expression over identical operands in both engines.
    Scale: the hourly rollup bounds the join input (series x hours, not
    raw events); the pair join is per-hour equi-join over a handful of
    series — at many-series scale this becomes series-pair blocking,
    but the sum shapes are unchanged.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value").alias("v"))
    a = hourly.select(
        F.col("event_type").alias("type_a"),
        "h",
        F.col("v").alias("x"),
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"),
        "h",
        F.col("v").alias("y"),
    )
    paired = a.join(b, "h").filter(F.col("type_a") < F.col("type_b"))
    dec = lambda c: F.col(c).cast("decimal(27,4)")
    sums = paired.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
    )
    corr = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("type_a", "type_b", "n", corr.alias("corr"))


@register("events_hll_rollup")
def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup via Datasketches HLL: per-day
    sketches of user_id are built once, then UNIONED upward to weekly
    and lifetime distinct-user estimates — the pre-aggregation design
    that answers "distinct users over any window" at 100 TB without
    re-touching raw data (exact count-distinct cannot merge; sketches
    are commutative monoids, so day partials roll up like sums).
    Approximate by nature -> rows-only check here; the estimate-vs-
    exact error bound is unit-tested in tests/test_llm_ops.py.
    """
    ev = load_table(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   hll_sketch_agg(user_id, 14) AS sk,
                   count(DISTINCT user_id) AS exact_day
            FROM {ev}
            GROUP BY 1, 2
        )
        SELECT event_type,
               date_trunc('week', day) AS week,
               count(*) AS n_days,
               hll_sketch_estimate(hll_union_agg(sk)) AS est_users,
               CAST(sum(exact_day) AS BIGINT) AS sum_daily_exact
        FROM daily
        GROUP BY 1, 2
        """,
        ev=ev,
    )


@register("events_theta_rollup")
def events_theta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Theta-sketch rollup (r6 VERDICT task 5) — the same
    re-aggregation design as ``events_hll_rollup``, proving Theta gets
    the identical monoid property the other sketch families have:
    per-day Theta sketches of user_id are built once, then
    ``theta_union_agg`` rolls them to weekly distinct-user estimates
    without re-touching raw data. Unlike HLL, the SAME day partials
    also answer intersections/differences later
    (``analytic_theta_set_algebra``) — one pre-aggregated sketch
    column serves the whole audience algebra at 100 TB.

    Approximate by nature -> rows-only check; the estimate-vs-exact
    weekly bound is unit-tested in tests/test_llm_ops.py."""
    ev = load_table(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   theta_sketch_agg(user_id, 12) AS sk,
                   count(DISTINCT user_id) AS exact_day
            FROM {ev}
            GROUP BY 1, 2
        )
        SELECT event_type,
               date_trunc('week', day) AS week,
               count(*) AS n_days,
               theta_sketch_estimate(theta_union_agg(sk, 12)) AS est_users,
               CAST(sum(exact_day) AS BIGINT) AS sum_daily_exact
        FROM daily
        GROUP BY 1, 2
        """,
        ev=ev,
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS step1_users,
           (SELECT count(*) FROM c) AS step2_users,
           (SELECT count(*) FROM p) AS step3_users
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each step counts users
    whose step event strictly FOLLOWS their earliest previous-step
    event — the order constraint is what separates a funnel from three
    independent counts.

    Scale shape: three user-keyed hash aggs, each joined to the
    (shrinking) previous step on user_id; step frames are tiny relative
    to the event stream, so the joins are broadcast-able and the only
    full-data shuffles are the per-step min-aggregations, which
    map-side combine to one row per user."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def step(name: str, prev: DataFrame | None, prev_ts: str, out_ts: str):
        e = ev.where(F.col("event_type") == name)
        if prev is not None:
            e = e.join(F.broadcast(prev), "user_id").where(
                F.col("ts") > F.col(prev_ts)
            )
        return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = step("view", None, "", "t1")
    c = step("click", v, "t1", "t2")
    p = step("purchase", c, "t2", "t3")
    counts = [
        df.agg(F.count(F.lit(1)).alias(alias))
        for df, alias in ((v, "step1_users"), (c, "step2_users"), (p, "step3_users"))
    ]
    out = counts[0].crossJoin(counts[1]).crossJoin(counts[2])
    return out


@register(
    "events_cohort_retention",
    oracle="""
    WITH firstw AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY 1
    ), act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT CAST(cohort AS TIMESTAMP) AS cohort,
           -- date_trunc('week') is a DATE in DuckDB: the difference is
           -- whole days, always a multiple of 7
           CAST((wk - cohort) // 7 AS BIGINT) AS week_offset,
           count(*) AS active_users
    FROM firstw JOIN act USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in every subsequent week they return. The offset is integer
    epoch arithmetic on week-truncated timestamps (not calendar
    datediff), so both engines agree by construction.

    Scale shape: first-activity agg + per-week distinct both shuffle on
    user_id and combine map-side; the cohort join is user-keyed; the
    final agg's key space is weeks², which is tiny forever."""
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    joined = firstw.join(act, "user_id")
    return (
        joined.withColumn(
            "week_offset",
            ((F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800)
            .cast("bigint"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "events_histogram_rollup",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(floor(value / 5.0) AS BIGINT) AS bin,
               count(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ), weekly AS (
        SELECT event_type, date_trunc('week', day) AS week, bin,
               CAST(sum(cnt) AS BIGINT) AS cnt
        FROM daily GROUP BY 1, 2, 3
    ), cum AS (
        SELECT event_type, week, bin, cnt,
               sum(cnt) OVER (PARTITION BY event_type, week
                              ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY event_type, week) AS total
        FROM weekly
    )
    SELECT event_type, week,
           CAST(max(total) AS BIGINT) AS n_events,
           round(min(CASE WHEN 2 * cum >= total THEN bin END) * 5.0, 1)
             AS p50_lo,
           round(min(CASE WHEN 20 * cum >= 19 * total THEN bin END) * 5.0, 1)
             AS p95_lo
    FROM cum GROUP BY event_type, week
    """,
)
def events_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram rollup — the exact-arithmetic
    sibling of the HLL rollup: per-day value histograms (bin width 5)
    are MERGED upward to weeks by summing bin counts (histograms are
    monoids, like sketches but lossless within bin resolution), then
    weekly p50/p95 lower bin edges fall out of the cumulative counts
    with pure integer comparisons — so unlike t-digest/KLL this
    pre-aggregated percentile pipeline is DuckDB-oracle EXACT.

    Scale shape: two hash aggs shrinking to (type × day × bins) then
    (type × week × bins) — partial combine makes the shuffles key-space
    sized, independent of event volume; the window runs per (type,
    week) over ≤ bins rows. The "percentiles over any window without
    re-touching raw data" pattern at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") / 5.0).cast("bigint").alias("bin"),
        )
        .groupBy("event_type", "day", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    weekly = (
        daily.groupBy(
            "event_type", F.date_trunc("week", "day").alias("week"), "bin"
        ).agg(F.sum("cnt").alias("cnt"))
    )
    from pyspark.sql import Window

    wsum = Window.partitionBy("event_type", "week").orderBy("bin")
    wall = Window.partitionBy("event_type", "week")
    cum = weekly.select(
        "event_type",
        "week",
        "bin",
        "cnt",
        F.sum("cnt").over(wsum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    return cum.groupBy("event_type", "week").agg(
        F.max("total").cast("bigint").alias("n_events"),
        F.round(
            F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("bin")))
            * 5.0,
            1,
        ).alias("p50_lo"),
        F.round(
            F.min(
                F.when(20 * F.col("cum") >= 19 * F.col("total"), F.col("bin"))
            )
            * 5.0,
            1,
        ).alias("p95_lo"),
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ), mad AS (
        SELECT e.event_type,
               max(m.med) AS med,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type
    )
    SELECT e.event_type,
           count(*) AS n_events,
           round(max(d.med), 6) AS med,
           round(max(d.mad), 6) AS mad,
           CAST(sum(CASE WHEN abs(e.value - d.med) > 3 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM events e JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per metric stream — the classic
    median/MAD rule (|x − med| > 3·MAD), the outlier flag a proxy's
    stats pipeline would emit. Two grouped exact-percentile passes
    (median, then median absolute deviation) with the per-type scalars
    broadcast back onto the stream; both engines run the identical
    interpolated-quantile selection over identical doubles, so even
    the boundary comparison is deterministic. Scale: percentiles per
    key are a sort-based agg over each type's values; the enrich joins
    broadcast (types ≪ events)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


@register(
    "events_seasonality",
    oracle=f"""
    SELECT event_type,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(dayofweek(ts) AS INT) AS day_of_week,
           count(*) AS n,
           {dsum_sql("value", 2)} AS sum_value,
           round({davg_sql("value", 2)}, 6) AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile — the hour-of-day × day-of-week load/value
    matrix per metric stream (the first thing an SRE plots from a
    proxy's traffic). One hash agg onto a key space bounded at
    |types|·24·7 regardless of event volume (map-side combine);
    decimal sums keep values hash-exact. DuckDB's dayofweek is
    0=Sunday; Spark's dayofweek is 1=Sunday — aligned by subtracting
    one on the Spark side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.hour("ts").cast("int").alias("hour_of_day"),
        (F.dayofweek("ts") - 1).cast("int").alias("day_of_week"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", 2).alias("sum_value"),
        F.round(davg("value", 2), 6).alias("avg_value"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n,
           CAST((1000000 * count(*))
                // sum(count(*)) OVER (PARTITION BY event_type)
             AS BIGINT) AS prob_e6
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov matrix: per-user event-type bigrams (lead over
    each user's time-ordered stream) aggregated into transition counts
    and integer-scaled row-conditional probabilities (exact ×1e6 floor
    division — no float summation anywhere, so the matrix hash-matches).
    Scale: one window shuffle on user_id (each user's slice sorts
    independently), one hash agg onto the |types|² key space, one
    window over ≤|types| rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr("1000000 * n div sum(n) over (partition by from_type)")
        .cast("bigint")
        .alias("prob_e6"),
    )


@register(
    "events_trend_slope",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) FROM events)
                 AS x,
               value AS y
        FROM events
    ), sums AS (
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(27,4)) * CAST(y AS DECIMAL(27,4)))
                 AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(27,4)) * CAST(x AS DECIMAL(27,4)))
                 AS DOUBLE) AS sxx
        FROM base GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(86400.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
             AS slope_per_day
    FROM sums
    """,
)
def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream trend: closed-form OLS slope of value over time
    (scaled to per-day), the drift detector a metrics pipeline runs
    before alerting on "this gauge is slowly climbing". Time is
    re-based to the corpus min epoch so the decimal power sums stay
    in range at any scale factor; the four sums are order-independent
    DECIMAL aggregates (same machinery as correlation/moments) and the
    final slope is one fixed IEEE expression over identical operands.
    Scale: one scalar broadcast (min ts) + one hash agg per type."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(
        F.floor(F.unix_timestamp(F.min("ts"))).cast("bigint").alias("t0")
    )
    base = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        (F.floor(F.unix_timestamp("ts")).cast("bigint") - F.col("t0")).alias("x"),
        F.col("value").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(27,4)")
    sums = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
    )
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            86400.0
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            9,
        ).alias("slope_per_day"),
    )


@register(
    "events_alert_rules",
    oracle="""
    WITH rules AS (
        SELECT * FROM (VALUES
            ('click',    40.0, 'warn'),
            ('click',    48.0, 'crit'),
            ('error',     5.0, 'warn'),
            ('purchase', 45.0, 'crit')
        ) AS t(rule_type, threshold, severity)
    )
    SELECT e.event_type, r.severity, r.threshold,
           CAST(count(*) AS BIGINT) AS n_alerts,
           CAST(min(e.event_id) AS BIGINT) AS first_event_id,
           round(max(e.value), 2) AS worst_value
    FROM events e JOIN rules r
      ON e.event_type = r.rule_type AND e.value > r.threshold
    GROUP BY e.event_type, r.severity, r.threshold
    """,
)
def events_alert_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proxy-native alert evaluation: a small RULES table (type,
    threshold, severity — in the reference's world this is what the
    SignalFx backend applies after forwarding) broadcast-joined onto
    the event stream; each breach groups into an alert summary. The
    canonical "tiny config dim × huge fact" join: rules broadcast,
    predicates pushed into the join, one hash agg on the rule key
    space. Batch form here; the same join runs stream-side unchanged
    (stream_static_enrich proves that path)."""
    ev = load_table(spark, sf_dir, "events")
    rules = spark.createDataFrame(
        [
            ("click", 40.0, "warn"),
            ("click", 48.0, "crit"),
            ("error", 5.0, "warn"),
            ("purchase", 45.0, "crit"),
        ],
        "rule_type string, threshold double, severity string",
    )
    return (
        ev.join(
            F.broadcast(rules),
            (F.col("event_type") == F.col("rule_type"))
            & (F.col("value") > F.col("threshold")),
        )
        .groupBy("event_type", "severity", "threshold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_alerts"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
            F.round(F.max("value"), 2).alias("worst_value"),
        )
    )


@register(
    "events_gap_report",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(lag(ts) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id)))
                   AS BIGINT) AS gap_s
        FROM events
    )
    SELECT event_type,
           CAST(count(gap_s) AS BIGINT) AS n_gaps,
           CAST(sum(CASE WHEN gap_s > 300 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outages,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s,
           CAST(sum(gap_s) AS BIGINT) AS sum_gap_s
    FROM gaps GROUP BY event_type
    """,
)
def events_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-health outage report: inter-arrival gaps per stream via
    lag() over event time; gaps over 5 minutes count as outages (the
    "did the scraper die" check a proxy runs on itself). Integer epoch
    arithmetic end to end. One window shuffle on the type key + one
    key-space agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts")).cast("bigint")
            - F.floor(F.unix_timestamp(F.lag("ts").over(w))).cast("bigint")
        ).alias("gap_s"),
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").cast("bigint").alias("n_gaps"),
        F.sum(F.when(F.col("gap_s") > 300, 1).otherwise(0))
        .cast("bigint")
        .alias("n_outages"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.sum("gap_s").cast("bigint").alias("sum_gap_s"),
    )


@register(
    "events_week_over_week",
    oracle=f"""
    WITH weekly AS (
        SELECT event_type, date_trunc('week', ts) AS week,
               count(*) AS n, {dsum_sql('value')} AS sum_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, CAST(n AS BIGINT) AS n, sum_value,
           CAST(n - lag(n) OVER w AS BIGINT) AS n_delta,
           round(100.0 * (n - lag(n) OVER w)
                 / CAST(lag(n) OVER w AS DOUBLE), 6) AS n_pct_change,
           round(sum_value - lag(sum_value) OVER w, 6) AS value_delta
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
)
def events_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week deltas per stream — the default dashboard
    comparison: weekly rollup (decimal-exact sums) then lag() per
    type for absolute and percent change (first week NULLs). One
    key-space agg + one window over |types|·weeks rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "event_type",
        "week",
        F.col("n").cast("bigint").alias("n"),
        "sum_value",
        (F.col("n") - F.lag("n").over(w)).cast("bigint").alias("n_delta"),
        F.round(
            100.0
            * (F.col("n") - F.lag("n").over(w))
            / F.lag("n").over(w).cast("double"),
            6,
        ).alias("n_pct_change"),
        F.round(
            F.col("sum_value") - F.lag("sum_value").over(w), 6
        ).alias("value_delta"),
    )


@register(
    "events_sessionize",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts)
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, value,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start,
           date_diff('microsecond', min(ts), max(ts)) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (the batch twin of the streamed
    session windows in `stream_session_stats`): a new session starts
    after >30 min of per-user inactivity; sessions get a per-user
    sequence number via the classic lag-gap-cumsum rewrite, then one
    hash agg per session. One shuffle on user_id serves both window
    passes AND the final agg (same key, Exchange reuse); ordering ties
    broken by event_id so both engines number identically. Duration in
    integer microseconds keeps the output hash-exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_s > 1800 * 1_000_000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("duration_us"),
        dsum("value").alias("total_value"),
    )


@register(
    "events_concurrency",
    oracle="""
    WITH deltas AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 300 SECOND AS t, -1 FROM events
    ), swept AS (
        SELECT event_type, t, delta,
               sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS running
        FROM deltas
    )
    SELECT event_type, date_trunc('day', t) AS day,
           CAST(max(running) AS BIGINT) AS max_concurrent
    FROM swept
    WHERE delta = 1
    GROUP BY event_type, date_trunc('day', t)
    """,
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per type and day via the +1/−1 interval sweep:
    each event occupies [ts, ts+5min); starts and ends become deltas,
    one running sum ordered by (time, delta) — ends sort before the
    starts sharing their timestamp, so half-open interval semantics
    fall out of the sort key and the result is tie-deterministic (tied
    rows carry equal deltas, so every interleaving yields the same
    running-max). The max is taken at start points only. One shuffle
    on event_type; the sweep is a single window pass — the standard
    O(n log n) rewrite of interval-overlap counting, linear shuffle
    bytes at 100 TB (2 rows per event)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 300 SECOND")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    from pyspark.sql import Window

    sweep = Window.partitionBy("event_type").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    swept = starts.unionAll(ends).withColumn(
        "running", F.sum("delta").over(sweep)
    )
    return (
        swept.where(F.col("delta") == 1)
        .groupBy("event_type", F.date_trunc("day", "t").alias("day"))
        .agg(F.max("running").alias("max_concurrent"))
    )


@register(
    "events_downsample_m4",
    oracle="""
    WITH b AS (
        SELECT event_type,
               date_trunc('hour', ts) AS bucket,
               ts, event_id, value
        FROM events
    ), ranked AS (
        SELECT event_type, bucket, value,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts, event_id) AS rn_first,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM b
    )
    SELECT event_type, bucket,
           count(*) AS n_points,
           min(value) AS v_min,
           max(value) AS v_max,
           min(CASE WHEN rn_first = 1 THEN value END) AS v_first,
           min(CASE WHEN rn_last = 1 THEN value END) AS v_last
    FROM ranked
    GROUP BY event_type, bucket
    """,
)
def events_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    series and time bucket keep exactly the min/max/first/last values —
    the four points that make a line chart of the bucket pixel-exact.
    This is the metrics-proxy rollup a charting backend serves.
    min/max aggregate directly; first/last ride a (ts, event_id)-
    ordered struct min/max so one hash aggregate produces all four —
    no window pass, no second shuffle, map-side combinable, and
    deterministic under timestamp ties. The oracle computes first/last
    independently via row_number windows."""
    ev = load_table(spark, sf_dir, "events")
    # Order key: (ts, event_id) packed in a struct so min/max pick the
    # earliest/latest row atomically; value rides along.
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min(key).getField("value").alias("v_first"),
            F.max(key).getField("value").alias("v_last"),
        )
    )


@register(
    "events_counter_to_rate",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(value AS DECIMAL(27,4)) * 10000 AS BIGINT) AS v_i
        FROM events
    ), c AS (
        SELECT user_id, ts, event_id,
               CAST(sum(v_i) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)
                    % 1000000 AS BIGINT) AS cum
        FROM s
    ), d AS (
        SELECT user_id, cum,
               cum - lag(cum) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS diff
        FROM c
    )
    SELECT user_id,
           count(*) AS n_samples,
           CAST(count(*) FILTER (WHERE diff < 0) AS BIGINT) AS n_resets,
           CAST(sum(CASE WHEN diff IS NULL THEN NULL
                         WHEN diff < 0 THEN cum ELSE diff END) AS BIGINT)
               AS total_increase
    FROM d GROUP BY user_id
    """,
)
def events_counter_to_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6's batch twin, oracle-EXACT: cumulative-counter samples are
    synthesized per user (integer-scaled running sum with a 1e6
    modulus, so wrap-around resets occur naturally), then converted to
    increases with the reference's counter rule — a decrease means the
    source counter reset, so the sample's whole value counts
    [P: the cumulative_counter semantics of the sfx protocol]. All
    arithmetic is integer (scaled by 1e4), so Spark and DuckDB agree
    bit-for-bit where the streaming twin can only be invariant-tested.
    One shuffle on user_id serves both window passes and the agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(27,4)") * 10000)
        .cast("bigint")
        .alias("v_i"),
    )
    c = s.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.sum("v_i").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            % 1000000
        )
        .cast("bigint")
        .alias("cum"),
    )
    d = c.select(
        "user_id",
        "cum",
        (F.col("cum") - F.lag("cum").over(w)).alias("diff"),
    )
    inc = (
        F.when(F.col("diff").isNull(), F.lit(None))
        .when(F.col("diff") < 0, F.col("cum"))
        .otherwise(F.col("diff"))
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.count_if(F.col("diff") < 0).cast("bigint").alias("n_resets"),
        F.sum(inc).cast("bigint").alias("total_increase"),
    )


@register("events_downsample_lttb")
def events_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB chart downsampling (Steinarsson 2013) to 50 points per
    event-type series — the shape-preserving sibling of the M4
    min/max/first/last rollup: each kept point maximizes the triangle
    with the previously kept point and the next bucket's mean, so
    trends and spikes survive where uniform sampling flattens them.
    One applyInPandas per series (parallel across series, vectorized
    within); deterministic (ts/id sort, first-index argmax ties) but
    sequential selection has no SQL twin -> rows-only; endpoint/count/
    subset/shape invariants + a hand-computed case live in
    tests/test_round4_ops.py."""
    from metricproxy_spark.operators.downsample import lttb_downsample

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "event_id",
    )
    return lttb_downsample(
        src,
        series_col="event_type",
        ts_col="ts_us",
        value_col="value",
        id_col="event_id",
        n_out=50,
    )


@register(
    "events_holt_trend",
    oracle="""
    WITH series AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               list(value ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY 1, 2
    ), fitted AS (
        -- NB list-typed accumulator [l, b], not a struct: DuckDB
        -- 1.0.0's list_reduce lets later struct_pack fields see
        -- earlier NEW fields under the same name (aliasing), which
        -- silently corrupts multi-field recurrences. Positional list
        -- elements have no names to shadow.
        SELECT event_type, day, len(vals) AS n,
               list_reduce(
                   list_prepend(
                       [vals[1], vals[2] - vals[1]],
                       list_transform(
                           list_slice(vals, 2, len(vals)),
                           x -> [x, CAST(0 AS DOUBLE)]
                       )
                   ),
                   (acc, e) -> [
                       0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                       0.5 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                              - acc[1]) + 0.5 * acc[2]
                   ]
               ) AS hw
        FROM series
    )
    SELECT event_type, day, n,
           hw[1] AS level, hw[2] AS trend,
           hw[1] + hw[2] AS forecast_1
    FROM fitted
    """,
)
def events_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per
    (event_type, day), alpha = beta = 0.5 — the trend-aware sibling of
    `events_ema` and the classic metric forecaster (level + trend →
    one-step forecast). Sequential by nature, so the same bounded
    per-group sorted-array fold: init l=x1, b=x2-x1, then one JVM
    `aggregate` HOF step per sample whose multiply-add chain is
    bit-identical to the DuckDB `list_reduce` twin — the SEQUENTIAL
    recurrence, not just aggregates, is value-checked. Single-sample
    days yield NULL trend/forecast in both engines. Group memory is
    bounded by guarded_series (see `events_ema` for the hot-key
    contract)."""
    from metricproxy_spark.operators.scale import guarded_series

    events = load_table(spark, sf_dir, "events")
    series = guarded_series(
        events,
        ["event_type", F.date_trunc("day", "ts").alias("day")],
        ["ts", "event_id", "value"],
    )
    staged = series.select(
        "event_type",
        "day",
        F.expr("transform(rows, r -> r.value)").alias("vals"),
    )
    hw = F.expr(
        "aggregate(slice(vals, 2, size(vals) - 1),"
        " struct(vals[0] AS l, vals[1] - vals[0] AS b),"
        " (acc, x) -> struct("
        "   0.5D * x + 0.5D * (acc.l + acc.b) AS l,"
        "   0.5D * ((0.5D * x + 0.5D * (acc.l + acc.b)) - acc.l)"
        "     + 0.5D * acc.b AS b))"
    )
    return staged.select(
        "event_type",
        "day",
        F.size("vals").cast("bigint").alias("n"),
        hw["l"].alias("level"),
        hw["b"].alias("trend"),
        (hw["l"] + hw["b"]).alias("forecast_1"),
    )


@register(
    "events_sla_burn_rate",
    oracle="""
    WITH base AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w5,
               date_trunc('hour', ts) AS w1h,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ), five AS (
        SELECT w1h, w5, count(*) AS n, CAST(sum(is_err) AS BIGINT) AS errs
        FROM base GROUP BY 1, 2
    ), hour AS (
        SELECT w1h, CAST(sum(n) AS BIGINT) AS n_total,
               CAST(sum(errs) AS BIGINT) AS n_errors,
               max(round((errs * 100.0) / n, 6)) AS worst_5m_err_pct
        FROM five GROUP BY 1
    )
    SELECT w1h AS window_start, n_total, n_errors,
           round((n_errors * 100.0) / n_total, 6) AS err_pct,
           round(((n_errors * 100.0) / n_total) / 1.0, 6) AS burn_rate_1h,
           worst_5m_err_pct,
           (((n_errors * 100.0) / n_total) / 1.0 > 14.4
            AND worst_5m_err_pct / 1.0 > 14.4) AS page_alert
    FROM hour
    """,
)
def events_sla_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE multi-window error-budget burn rate over the event stream
    (the Google SRE workbook's multiwindow multi-burn-rate alert, on a
    99% SLO ⇒ 1% budget): per hour, the hourly burn rate AND the worst
    5-minute burn inside it — paging only when BOTH exceed 14.4×
    budget kills the single-window false-positive/slow-detect
    tradeoff. Two nested rollups (5m → 1h) so the short-window maximum
    needs no second scan; integer counts until two final divisions
    rounded to 6dp keep both engines bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.window("ts", "5 minutes").getField("start").alias("w5"),
        F.date_trunc("hour", "ts").alias("w1h"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    five = base.groupBy("w1h", "w5").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_err").cast("bigint").alias("errs"),
    )
    hour = five.groupBy("w1h").agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum("errs").cast("bigint").alias("n_errors"),
        F.max(
            F.round((F.col("errs") * 100.0) / F.col("n"), 6)
        ).alias("worst_5m_err_pct"),
    )
    err_pct = F.round((F.col("n_errors") * 100.0) / F.col("n_total"), 6)
    burn_1h = F.round(
        ((F.col("n_errors") * 100.0) / F.col("n_total")) / 1.0, 6
    )
    return hour.select(
        F.col("w1h").alias("window_start"),
        "n_total",
        "n_errors",
        err_pct.alias("err_pct"),
        burn_1h.alias("burn_rate_1h"),
        "worst_5m_err_pct",
        (
            (((F.col("n_errors") * 100.0) / F.col("n_total")) / 1.0 > 14.4)
            & (F.col("worst_5m_err_pct") / 1.0 > 14.4)
        ).alias("page_alert"),
    )


@register(
    "events_cusum_score",
    oracle="""
    WITH series AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               list(value ORDER BY ts, event_id) AS vals,
               (CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE)
                / COUNT(value)) AS mu
        FROM events
        GROUP BY 1, 2
    ), folded AS (
        -- positional-list accumulator [s_plus, best] (see
        -- events_holt_trend for why not a struct)
        SELECT event_type, day, len(vals) AS n,
               list_reduce(
                   list_prepend(
                       [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                       list_transform(vals, x -> [x - mu - 0.5, CAST(0 AS DOUBLE)])
                   ),
                   (acc, e) -> [
                       greatest(CAST(0 AS DOUBLE), acc[1] + e[1]),
                       greatest(acc[2],
                                greatest(CAST(0 AS DOUBLE), acc[1] + e[1]))
                   ]
               ) AS cs
        FROM series
    )
    SELECT event_type, day, n,
           cs[1] AS cusum_end, cs[2] AS cusum_max,
           cs[2] > 4.0 AS shifted
    FROM folded
    """,
)
def events_cusum_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point score per (event_type, day) (Page
    1954): S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k)) with slack k=0.5 —
    the classic sequential drift detector; a day whose max S⁺ exceeds
    the decision interval h=4 likely contains an upward mean shift.
    Same bounded per-group sorted-array fold as the EMA/Holt family:
    μ comes from the exact decimal mean (both engines agree
    bit-for-bit), the per-sample deltas are staged by one transform,
    and the fold's max/add chain is identical IEEE arithmetic in both
    engines, so the SEQUENTIAL detector — end state, running max and
    decision — is value-checked exactly. Group memory is bounded by
    guarded_series (see `events_ema` for the hot-key contract)."""
    from metricproxy_spark.operators.scale import guarded_series

    events = load_table(spark, sf_dir, "events")
    series = guarded_series(
        events,
        ["event_type", F.date_trunc("day", "ts").alias("day")],
        ["ts", "event_id", "value"],
        extra_aggs=(davg("value").alias("mu"),),
    )
    staged = series.select(
        "event_type",
        "day",
        F.expr("transform(rows, r -> r.value - mu - 0.5D)").alias("deltas"),
    )
    cs = F.expr(
        "aggregate(deltas, struct(0D AS s, 0D AS best),"
        " (acc, d) -> struct("
        "   greatest(0D, acc.s + d) AS s,"
        "   greatest(acc.best, greatest(0D, acc.s + d)) AS best))"
    )
    return staged.select(
        "event_type",
        "day",
        F.size("deltas").cast("bigint").alias("n"),
        cs["s"].alias("cusum_end"),
        cs["best"].alias("cusum_max"),
        (cs["best"] > 4.0).alias("shifted"),
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               date_trunc('day', ts) AS day_ts,
               epoch_us(ts) AS t_us,
               CAST(value AS DECIMAL(18,4)) AS v,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY epoch_us(ts), event_id
               ) AS t_next
        FROM events
    ), seg AS (
        SELECT event_type, day_ts, v, t_next - t_us AS dt_us
        FROM seq WHERE t_next IS NOT NULL
    )
    SELECT event_type, day_ts,
           count(*) AS n_segments,
           CAST(SUM(dt_us) AS BIGINT) AS span_us,
           round(CAST(SUM(v * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE), 6) AS twa
    FROM seg
    GROUP BY 1, 2
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over IRREGULARLY sampled series — the
    metrics-engine aggregation a plain AVG gets wrong (a value that
    held for an hour must weigh 3600× one that held a second; every
    monitoring product's rollup does this). Step-function (LOCF)
    integral per (type, day): each sample's value is weighted by the
    microseconds until the next sample; the day's last sample carries
    no weight (no successor — the standard half-open convention).

    Exactness: weights are integer µs, values DECIMAL(18,4); the
    weighted sum is a decimal product summed exactly, with ONE double
    division at the end (rounded 6dp). One window sort shuffle per
    series + one hash agg — linear, the sessionize scale shape."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "day_ts").orderBy("t_us", "event_id")
    seq = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.unix_micros("ts").alias("t_us"),
        F.col("value").cast("decimal(18,4)").alias("v"),
        "event_id",
    ).withColumn("t_next", F.lead("t_us").over(w))
    seg = seq.where(F.col("t_next").isNotNull()).withColumn(
        "dt_us", F.col("t_next") - F.col("t_us")
    )
    return seg.groupBy("event_type", "day_ts").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dt_us").cast("bigint").alias("span_us"),
        F.round(
            F.sum(F.col("v") * F.col("dt_us")).cast("double")
            / F.sum("dt_us").cast("double"),
            6,
        ).alias("twa"),
    )


@register(
    "events_kalman_level",
    oracle="""
    WITH series AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               list(value ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY 1, 2
    ), folded AS (
        -- positional-list accumulator [x, P, i] (see events_holt_trend
        -- for why not a struct); i=0 marks the uninitialized state.
        SELECT event_type, day, len(vals) AS n,
               list_reduce(
                   list_prepend(
                       [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                        CAST(0 AS DOUBLE)],
                       list_transform(vals, z -> [z, CAST(0 AS DOUBLE),
                                                  CAST(0 AS DOUBLE)])
                   ),
                   (acc, e) -> CASE WHEN acc[3] = 0 THEN
                       [e[1], CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)]
                   ELSE [
                       acc[1] + ((acc[2] + 0.01) / ((acc[2] + 0.01) + 1.0))
                                * (e[1] - acc[1]),
                       (1.0 - (acc[2] + 0.01) / ((acc[2] + 0.01) + 1.0))
                                * (acc[2] + 0.01),
                       acc[3] + 1.0
                   ] END
               ) AS st
        FROM series
    )
    SELECT event_type, day, n,
           st[1] AS level_end,
           st[2] AS variance_end,
           (st[2] + 0.01) / ((st[2] + 0.01) + 1.0) AS gain_end
    FROM folded
    """,
)
def events_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter, local-level model, per (event_type, day)
    (Kalman 1960; the random-walk-plus-noise state-space smoother
    behind every monitoring product's adaptive baseline): with process
    noise Q=0.01 and observation noise R=1, each step predicts
    P⁻ = P + Q, gains K = P⁻/(P⁻ + R), and updates
    x ← x + K(z − x), P ← (1−K)P⁻; the state initializes on the first
    observation (x=z₁, P=1).

    Same evidence trick as the EMA/Holt/CUSUM family: the per-group
    sorted-array fold runs the IDENTICAL IEEE double sequence in Spark
    (``aggregate`` struct accumulator) and DuckDB (``list_reduce``
    positional-list accumulator), so the sequential filter's end state
    — level, posterior variance, settled gain — is value-checked
    bit-for-bit with no tolerance. Group memory is bounded by
    guarded_series (hot-key contract in `events_ema`)."""
    from metricproxy_spark.operators.scale import guarded_series

    events = load_table(spark, sf_dir, "events")
    series = guarded_series(
        events,
        ["event_type", F.date_trunc("day", "ts").alias("day")],
        ["ts", "event_id", "value"],
    )
    staged = series.select(
        "event_type",
        "day",
        F.expr("transform(rows, r -> r.value)").alias("vals"),
    )
    st = F.expr(
        "aggregate(vals, struct(0D AS x, 0D AS p, 0D AS i),"
        " (acc, z) -> CASE WHEN acc.i = 0D THEN"
        "   struct(z AS x, 1.0D AS p, 1.0D AS i)"
        " ELSE struct("
        "   acc.x + ((acc.p + 0.01D) / ((acc.p + 0.01D) + 1.0D))"
        "         * (z - acc.x) AS x,"
        "   (1.0D - (acc.p + 0.01D) / ((acc.p + 0.01D) + 1.0D))"
        "         * (acc.p + 0.01D) AS p,"
        "   acc.i + 1.0D AS i) END)"
    )
    return staged.select(
        "event_type",
        "day",
        F.size("vals").cast("bigint").alias("n"),
        st["x"].alias("level_end"),
        st["p"].alias("variance_end"),
        (
            (st["p"] + F.lit(0.01)) / ((st["p"] + F.lit(0.01)) + F.lit(1.0))
        ).alias("gain_end"),
    )


@register(
    "events_apdex",
    oracle="""
    WITH graded AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hour_ts,
               CASE WHEN value <= 100 THEN 1 ELSE 0 END AS sat,
               CASE WHEN value > 100 AND value <= 400 THEN 1 ELSE 0 END
                 AS tol
        FROM events
    )
    SELECT event_type, hour_ts,
           count(*) AS n_events,
           CAST(SUM(sat) AS BIGINT) AS n_satisfied,
           CAST(SUM(tol) AS BIGINT) AS n_tolerating,
           (CAST(SUM(sat) AS DOUBLE) + 0.5 * CAST(SUM(tol) AS DOUBLE))
             / CAST(count(*) AS DOUBLE) AS apdex
    FROM graded
    GROUP BY 1, 2
    """,
)
def events_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-ext: Apdex score per (event_type, hour) — the standard SLO
    satisfaction index (public spec: apdex.org Apdex Alliance technical
    specification): T = 100, satisfied value <= T, tolerating
    T < value <= 4T, score = (satisfied + tolerating/2) / total. The
    SRE companion to `events_sla_burn_rate`.

    Exactness: the score is integer counts combined by one IEEE
    multiply-add and one division — bit-identical across engines, no
    decimal plumbing needed. Scale shape: identical to
    `events_hourly_stats` — one hash agg on (type, hour) with map-side
    combine; group count is bounded by types x hours, independent of
    row count."""
    ev = load_table(spark, sf_dir, "events")
    sat = F.when(F.col("value") <= 100, 1).otherwise(0)
    tol = F.when((F.col("value") > 100) & (F.col("value") <= 400), 1).otherwise(0)
    g = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(sat).alias("n_satisfied"),
        F.sum(tol).alias("n_tolerating"),
    )
    apdex = (
        F.col("n_satisfied").cast("double")
        + F.lit(0.5) * F.col("n_tolerating").cast("double")
    ) / F.col("n_events").cast("double")
    return g.select(
        "event_type",
        "hour_ts",
        "n_events",
        "n_satisfied",
        "n_tolerating",
        apdex.alias("apdex"),
    )


@register(
    "events_holt_winters",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS x
        FROM events
        GROUP BY 1, 2
    ), series AS (
        SELECT event_type, list(x ORDER BY hour_ts) AS vals
        FROM hourly GROUP BY 1
    ), seeded AS (
        SELECT event_type, vals, len(vals) AS n,
               list_reduce(list_slice(vals, 1, 24),
                           (a, x) -> a + x) / 24.0 AS l0
        FROM series WHERE len(vals) > 24
    ), fitted AS (
        -- positional LIST accumulator [l, b, s1..s24]: DuckDB 1.0's
        -- list_reduce struct aliasing bug (see events_holt_trend)
        -- rules out struct accumulators; the seasonal ring rotates by
        -- slicing [4:] and appending the refreshed component. l_new
        -- is inlined at each use exactly as the Spark HOF does, so
        -- the IEEE op chain is identical.
        SELECT event_type, n, l0,
               list_reduce(
                   list_prepend(
                       list_concat(
                           [l0, CAST(0 AS DOUBLE)],
                           list_transform(list_slice(vals, 1, 24),
                                          x -> x - l0)
                       ),
                       list_transform(
                           list_slice(vals, 25, len(vals)),
                           x -> list_concat([x],
                                list_transform(range(25), i -> CAST(0 AS DOUBLE)))
                       )
                   ),
                   (acc, e) -> list_concat(
                       list_concat(
                           [
                             0.5 * (e[1] - acc[3])
                               + 0.5 * (acc[1] + acc[2]),
                             0.25 * ((0.5 * (e[1] - acc[3])
                                      + 0.5 * (acc[1] + acc[2])) - acc[1])
                               + 0.75 * acc[2]
                           ],
                           list_slice(acc, 4, 26)
                       ),
                       [0.25 * (e[1] - (0.5 * (e[1] - acc[3])
                                        + 0.5 * (acc[1] + acc[2])))
                          + 0.75 * acc[3]]
                   )
               ) AS hw
        FROM seeded
    )
    SELECT event_type, n,
           hw[1] AS level, hw[2] AS trend,
           hw[1] + hw[2] + hw[3] AS forecast_1,
           list_aggregate(list_slice(hw, 3, 26), 'min') AS season_lo,
           list_aggregate(list_slice(hw, 3, 26), 'max') AS season_hi
    FROM fitted
    """,
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE SEASONAL triple exponential smoothing per
    event_type over the hourly rollup, period m = 24 (the daily cycle),
    alpha = 0.5, beta = gamma = 0.25 (dyadic, like the Holt/EMA
    family). Init: l0 = mean of the first day, b0 = 0, seasonal
    components x_i - l0; then the textbook recurrence (Winters 1960 /
    Hyndman fpp3):

        l_t = a(x_t - s_{t-m}) + (1-a)(l_{t-1} + b_{t-1})
        b_t = B(l_t - l_{t-1}) + (1-B) b_{t-1}
        s_t = y(x_t - l_t)    + (1-y) s_{t-m}

    The fold runs over OBSERVED hourly buckets in time order (sparse
    hours simply advance the ring — documented, deterministic). Inputs
    are exact-decimal hourly sums, so the whole chain is IEEE
    bit-identical across engines; the DuckDB twin folds the identical
    positional-list accumulator [l, b, s1..s24] (struct accumulators
    hit DuckDB 1.0's list_reduce aliasing bug, see events_holt_trend).
    The final seasonal ring is value-checked through its min/max and
    the one-step forecast l + b + s_next.

    Scale shape: the hourly rollup is the only data-sized shuffle
    (map-side combine); the fold is per-type over bounded series
    (hours-per-retention), the same group-memory contract as
    events_ema. Emits only types with > m observed buckets."""
    m = 24
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(dsum("value").alias("x"))
    series = hourly.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(hour_ts, x))),"
            " r -> r.x)"
        ).alias("vals")
    )
    seeded = series.where(F.size("vals") > m).withColumn(
        "l0",
        F.expr(
            f"aggregate(slice(vals, 2, {m - 1}), vals[0],"
            " (a, x) -> a + x) / 24.0D"
        ),
    )
    l_new = "(0.5D * (x - acc.s[0]) + 0.5D * (acc.l + acc.b))"
    hw = F.expr(
        f"aggregate(slice(vals, {m + 1}, size(vals) - {m}),"
        f" struct(l0 AS l, 0D AS b,"
        f"        transform(slice(vals, 1, {m}), x -> x - l0) AS s),"
        f" (acc, x) -> struct("
        f"   {l_new} AS l,"
        f"   0.25D * ({l_new} - acc.l) + 0.75D * acc.b AS b,"
        f"   concat(slice(acc.s, 2, {m - 1}),"
        f"          array(0.25D * (x - {l_new}) + 0.75D * acc.s[0])) AS s))"
    )
    fitted = seeded.select(
        "event_type", F.size("vals").cast("bigint").alias("n"), hw.alias("hw")
    )
    return fitted.select(
        "event_type",
        "n",
        F.col("hw.l").alias("level"),
        F.col("hw.b").alias("trend"),
        (F.col("hw.l") + F.col("hw.b") + F.col("hw.s")[0]).alias(
            "forecast_1"
        ),
        F.array_min("hw.s").alias("season_lo"),
        F.array_max("hw.s").alias("season_hi"),
    )


@register(
    "events_seasonal_outliers",
    oracle="""
    WITH prof AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hod,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS mean,
               CAST(SUM(CAST(value * value AS DECIMAL(27,8))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS msq
        FROM events GROUP BY 1, 2
    ), scored AS (
        SELECT e.event_type, CAST(hour(e.ts) AS INT) AS hod,
               CASE WHEN abs(e.value - p.mean)
                         > 3.0 * sqrt(greatest(p.msq - p.mean * p.mean,
                                               CAST(0 AS DOUBLE)))
                    THEN 1 ELSE 0 END AS is_out
        FROM events e
        JOIN prof p ON p.event_type = e.event_type
                   AND p.hod = CAST(hour(e.ts) AS INT)
    )
    SELECT p.event_type, p.hod, p.n,
           round(p.mean, 6) AS mean_value,
           round(sqrt(greatest(p.msq - p.mean * p.mean,
                               CAST(0 AS DOUBLE))), 6) AS std_value,
           CAST(s.n_outliers AS BIGINT) AS n_outliers
    FROM prof p
    JOIN (SELECT event_type, hod, SUM(is_out) AS n_outliers
          FROM scored GROUP BY 1, 2) s
      ON s.event_type = p.event_type AND s.hod = p.hod
    """,
)
def events_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-ext: seasonal (hour-of-day) profile outlier detection — the
    deseasonalized 3-sigma rule behind Twitter's S-H-ESD family: build
    a per (event_type, hour-of-day) mean/std profile over the whole
    window, then flag events more than 3 sigma from THEIR hour's
    profile (a 3 a.m. spike is judged against 3 a.m. traffic, not the
    daily blend). Complements `events_anomaly_mad` (global robust) and
    `events_holt_winters` (model-based).

    Exactness: mean and the second moment ride exact DECIMAL sums
    (value^2 has 4 true decimals -> scale 8), variance/sigma are then
    a fixed IEEE chain (guarded non-negative) identical in both
    engines, so every outlier flag lands on the same side of the
    threshold. Scale shape: one scan builds the 120-row profile
    (types x 24), broadcast back onto the stream for the flag pass —
    two scans total, no data-sized shuffle beyond the profile agg."""
    ev = load_table(spark, sf_dir, "events")
    hod = F.hour("ts").cast("int")
    prof = ev.groupBy(F.col("event_type"), hod.alias("hod")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean"),
        (
            F.sum(
                (F.col("value") * F.col("value")).cast("decimal(27,8)")
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("msq"),
    )
    std = F.sqrt(
        F.greatest(
            F.col("mean_msq") - F.col("mean_mean") * F.col("mean_mean"),
            F.lit(0.0),
        )
    )
    p = prof.select(
        F.col("event_type"),
        F.col("hod"),
        F.col("n"),
        F.col("mean").alias("mean_mean"),
        F.col("msq").alias("mean_msq"),
    )
    scored = (
        ev.select("event_type", hod.alias("hod"), "value")
        .join(F.broadcast(p), ["event_type", "hod"])
        .select(
            "event_type",
            "hod",
            F.when(
                F.abs(F.col("value") - F.col("mean_mean")) > 3.0 * std, 1
            )
            .otherwise(0)
            .alias("is_out"),
        )
        .groupBy("event_type", "hod")
        .agg(F.sum("is_out").cast("bigint").alias("n_outliers"))
    )
    return (
        p.join(scored, ["event_type", "hod"])
        .select(
            "event_type",
            "hod",
            "n",
            F.round(F.col("mean_mean"), 6).alias("mean_value"),
            F.round(std, 6).alias("std_value"),
            "n_outliers",
        )
    )


@register(
    "events_autocorrelation",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               {dsum_sql('value')} AS v
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, v,
               lag(v, 1) OVER w AS l1,
               lag(v, 2) OVER w AS l2,
               lag(v, 3) OVER w AS l3
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), pairs AS (
        SELECT event_type, 1 AS lag_hours, v AS x, l1 AS y
        FROM lagged WHERE l1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, v, l2 FROM lagged WHERE l2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, v, l3 FROM lagged WHERE l3 IS NOT NULL
    ), sums AS (
        SELECT event_type, lag_hours, count(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(27,4)) * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(27,4)) * CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(27,4)) * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS syy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag_hours AS INT) AS lag_hours,
           CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS acf
    FROM sums
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3 h) of each per-type hourly
    series — the seasonality/memory diagnostic behind "is this metric
    periodic, trending, or white noise" and the standard pre-check
    before fitting the Holt/Holt-Winters family. Defined over the
    OBSERVED hourly sequence (row-based lag, identical ordering in
    both engines), correlating (x_t, x_{{t-k}}) as a Pearson over the
    five decimal-exact power sums — same exactness machinery as
    `events_series_correlation`: the hourly inputs are 4dp-exact
    doubles, products are 8dp-exact decimals, and the final acf is one
    fixed IEEE expression over identical operands. Scale: one hourly
    rollup bounds everything downstream to |types|·hours rows; the lag
    window partitions by type (no global sort) and the final agg is
    map-side combinable."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 2).over(w).alias("l2"),
        F.lag("v", 3).over(w).alias("l3"),
    )
    pairs = None
    for k in (1, 2, 3):
        p = lagged.where(F.col(f"l{k}").isNotNull()).select(
            "event_type",
            F.lit(k).alias("lag_hours"),
            F.col("v").alias("x"),
            F.col(f"l{k}").alias("y"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    dec = lambda c: F.col(c).cast("decimal(27,4)")
    sums = pairs.groupBy("event_type", "lag_hours").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
    )
    acf = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "event_type",
        F.col("lag_hours").cast("int").alias("lag_hours"),
        F.col("n").cast("bigint").alias("n"),
        acf.alias("acf"),
    )


@register(
    "events_rolling_median",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               {dsum_sql('value')} AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, h, v,
           median(v) OVER (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
             AS rolling_median
    FROM hourly
    """,
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median smoother (25-hour centered window) per stream —
    the robust-to-spikes trend line dashboards overlay where a moving
    AVERAGE would chase outliers. Median is a SELECTION, not
    arithmetic: over 4dp-exact decimal-sum inputs the picked element
    (or the midpoint of the middle two — exact binary halving) is
    bit-identical across engines, so the whole smoothed series
    hash-matches with no rounding discipline. DOUBLE inputs on the
    oracle side are load-bearing: DuckDB's DECIMAL median takes the
    lower-middle instead of interpolating. One hourly rollup bounds
    the window input to |types|x|hours| rows; the window partitions by
    type — no global sort."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-12, 12)
    return hourly.select(
        "event_type",
        "h",
        "v",
        F.expr("percentile(v, 0.5)").over(w).alias("rolling_median"),
    )


@register(
    "events_changepoint",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS vd
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, h,
               CAST(row_number() OVER w AS BIGINT) AS t,
               CAST(SUM(vd) OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS c,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(SUM(vd) OVER (PARTITION BY event_type) AS DOUBLE) AS s
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), gains AS (
        SELECT event_type, h, t, n,
               c*c/t + (s-c)*(s-c)/(n-t) - s*s/n AS gain
        FROM seq WHERE t < n
    ), ranked AS (
        SELECT event_type, h, t, n, gain,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY gain DESC, t) AS rk
        FROM gains
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(t AS BIGINT) AS split_t, h AS split_hour, gain
    FROM ranked WHERE rk = 1
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection — one round of binary segmentation per
    stream: the split hour k maximizing the variance-reduction gain
    S1²/n1 + S2²/n2 − S²/n (the CUSUM-of-squares / PELT unit cost),
    computed entirely from prefix sums. Exactness: the hourly values
    and their running prefix sums are DECIMAL (order-independent,
    bit-identical across engines, cast to double exactly), and the
    gain is one fixed IEEE expression over those identical operands —
    so the per-split gains, their ordering, and the argmax all agree
    without rounding discipline (ties break on earliest split). Scale:
    one hourly rollup, one partitioned window pass for prefix sums
    (no global sort), one window argmax over |types|·hours rows —
    the raw table is touched once."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("vd"))
    wo = Window.partitionBy("event_type").orderBy("h")
    wall = Window.partitionBy("event_type")
    seq = hourly.select(
        "event_type",
        "h",
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.sum("vd")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("c"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("vd").over(wall).cast("double").alias("s"),
    )
    gains = seq.where(F.col("t") < F.col("n")).select(
        "event_type",
        "h",
        "t",
        "n",
        (
            F.col("c") * F.col("c") / F.col("t")
            + (F.col("s") - F.col("c")) * (F.col("s") - F.col("c"))
            / (F.col("n") - F.col("t"))
            - F.col("s") * F.col("s") / F.col("n")
        ).alias("gain"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("gain"), "t")
    )
    return (
        gains.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("t").alias("split_t"),
            F.col("h").alias("split_hour"),
            "gain",
        )
    )


@register(
    "events_theil_sen",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               {dsum_sql('value')} AS v
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, v,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                    AS BIGINT) AS t
        FROM hourly
    ), slopes AS (
        SELECT a.event_type,
               (b.v - a.v) / CAST(b.t - a.t AS DOUBLE) AS slope
        FROM seq a JOIN seq b
          ON a.event_type = b.event_type AND a.t < b.t
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           median(slope) AS theil_sen_slope
    FROM slopes GROUP BY event_type
    """,
)
def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator per stream: the median of all
    pairwise slopes of the hourly series — the breakdown-resistant
    alternative to least-squares `events_trend_slope` (tolerates ~29%
    outliers). Slopes divide decimal-exact doubles by exact integer
    hour-steps (identical IEEE in both engines) and the median is a
    selection/midpoint over those identical values — hash-exact with
    no rounding discipline. Scale honesty: the pair join is O(H²) in
    the HOURLY ROLLUP (H = hours per stream, growing with wall time,
    not data volume) and partitions by stream — the same bounded
    regime as the recurrence family; the raw table is touched once by
    the rollup."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value").alias("v"))
    seq = hourly.select(
        "event_type",
        "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("h"))
        .cast("bigint")
        .alias("t"),
    )
    # seq feeds BOTH sides of the pair self-join; AQE does not reuse
    # the exchange across the aliases, so without this hours-sized
    # lineage cut the raw-events rollup executes twice.
    seq = seq.localCheckpoint(eager=True)
    a = seq.select("event_type", F.col("v").alias("v1"), F.col("t").alias("t1"))
    b = seq.select("event_type", F.col("v").alias("v2"), F.col("t").alias("t2"))
    slopes = a.join(b, "event_type").where(F.col("t1") < F.col("t2")).select(
        "event_type",
        ((F.col("v2") - F.col("v1")) / (F.col("t2") - F.col("t1")).cast("double")).alias(
            "slope"
        ),
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("theil_sen_slope"),
    )


@register(
    "events_forecast_backtest",
    oracle="""
    WITH series AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               list(value ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY 1, 2
    ), fitted AS (
        -- positional list accumulator [l, b, sae, npred] (see
        -- events_holt_trend's aliasing note); each step scores the
        -- PRE-update one-step forecast l+b against the arriving x
        SELECT event_type, day, len(vals) AS n,
               list_reduce(
                   list_prepend(
                       [vals[1], vals[2] - vals[1],
                        CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                       list_transform(
                           list_slice(vals, 2, len(vals)),
                           x -> [x, CAST(0 AS DOUBLE),
                                 CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]
                       )
                   ),
                   (acc, e) -> [
                       0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                       0.5 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                              - acc[1]) + 0.5 * acc[2],
                       acc[3] + abs(e[1] - (acc[1] + acc[2])),
                       acc[4] + 1
                   ]
               ) AS hw
        FROM series
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CAST(hw[4] AS BIGINT) AS n_preds,
           hw[3] AS sum_abs_err,
           hw[3] / hw[4] AS mae
    FROM fitted WHERE n >= 2
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward forecast evaluation (backtest) of the Holt
    smoother: at every step the PRE-update one-step forecast l+b is
    scored against the sample that actually arrives, accumulating the
    absolute error inside the same sequential fold that fits the model
    — the honest way to evaluate a forecaster (no lookahead; each
    prediction uses only prior samples). The fold's accumulator grows
    to [l, b, sum_abs_err, n_preds]; every operation is the same
    multiply-add/abs chain in both engines, so per-day MAE is
    bit-identical. Same guarded_series bounded-group contract as the
    rest of the recurrence family."""
    from metricproxy_spark.operators.scale import guarded_series

    events = load_table(spark, sf_dir, "events")
    series = guarded_series(
        events,
        ["event_type", F.date_trunc("day", "ts").alias("day")],
        ["ts", "event_id", "value"],
    )
    staged = series.select(
        "event_type",
        "day",
        F.expr("transform(rows, r -> r.value)").alias("vals"),
    )
    hw = F.expr(
        "aggregate(slice(vals, 2, size(vals) - 1),"
        " struct(vals[0] AS l, vals[1] - vals[0] AS b,"
        "        0.0D AS sae, 0.0D AS np),"
        " (acc, x) -> struct("
        "   0.5D * x + 0.5D * (acc.l + acc.b) AS l,"
        "   0.5D * ((0.5D * x + 0.5D * (acc.l + acc.b)) - acc.l)"
        "     + 0.5D * acc.b AS b,"
        "   acc.sae + abs(x - (acc.l + acc.b)) AS sae,"
        "   acc.np + 1.0D AS np))"
    )
    return (
        staged.where(F.size("vals") >= 2)
        .select(
            "event_type",
            "day",
            F.size("vals").cast("bigint").alias("n"),
            hw["np"].cast("bigint").alias("n_preds"),
            hw["sae"].alias("sum_abs_err"),
            (hw["sae"] / hw["np"]).alias("mae"),
        )
    )


@register(
    "events_rate_limit_audit",
    oracle="""
    WITH per_step AS (
        SELECT event_type, CAST(user_id % 4 AS BIGINT) AS shard,
               CAST(floor(epoch(ts) / 600) AS BIGINT) AS step,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3
    ), series AS (
        SELECT event_type, shard, list([step, n] ORDER BY step) AS steps
        FROM per_step GROUP BY 1, 2
    ), folded AS (
        -- positional accumulator [prev_step, tokens, dropped, consumed];
        -- bucket: cap 6, refill 2 per elapsed step, consume up to the
        -- available tokens, count the overflow as dropped
        SELECT event_type, shard, len(steps) AS n_steps,
               list_reduce(
                   list_prepend(
                       [steps[1][1],
                        2 - least(steps[1][2], CAST(2 AS BIGINT)),
                        steps[1][2] - least(steps[1][2], CAST(2 AS BIGINT)),
                        least(steps[1][2], CAST(2 AS BIGINT))],
                       list_slice(steps, 2, len(steps))
                   ),
                   (acc, e) -> [
                       e[1],
                       least(acc[2] + 1 * (e[1] - acc[1]), CAST(2 AS BIGINT))
                         - least(e[2], least(acc[2] + 1 * (e[1] - acc[1]),
                                             CAST(2 AS BIGINT))),
                       acc[3] + e[2]
                         - least(e[2], least(acc[2] + 1 * (e[1] - acc[1]),
                                             CAST(2 AS BIGINT))),
                       acc[4] + least(e[2], least(acc[2] + 1 * (e[1] - acc[1]),
                                                  CAST(2 AS BIGINT)))
                   ]
               ) AS st
        FROM series
    )
    SELECT event_type, shard, CAST(n_steps AS BIGINT) AS n_steps,
           st[4] AS total_consumed, st[3] AS total_dropped,
           st[2] AS final_tokens
    FROM folded
    """,
)
def events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate-limit audit — the proxy's throttling
    semantics replayed over history: per (stream, client shard), a
    bucket of capacity 2 refilling 1 token per elapsed 10-minute
    step admits requests and counts the overflow as DROPPED. The
    bucket is a sequential integer fold (state = [prev_step, tokens,
    dropped, consumed]) over the per-step request counts — pure
    integer min/add arithmetic, so the fold is bit-identical in both
    engines via the positional list_reduce twin (the recurrence-family
    pattern, cf. events_holt_trend). Answers "which clients would a
    given policy throttle, and by how much" before deploying the
    policy. Scale: one (type,shard,step) rollup bounds the fold input;
    guarded_series caps group memory."""
    from metricproxy_spark.operators.scale import guarded_series

    CAP, REFILL = 2, 1
    events = load_table(spark, sf_dir, "events")
    per_step = events.groupBy(
        "event_type",
        (F.col("user_id") % 4).cast("bigint").alias("shard"),
        F.floor(F.unix_timestamp("ts") / 600).cast("bigint").alias("step"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    series = guarded_series(
        per_step, ["event_type", "shard"], ["step", "n"]
    )
    staged = series.select(
        "event_type",
        "shard",
        F.size("rows").cast("bigint").alias("n_steps"),
        F.expr("transform(rows, r -> struct(r.step AS s, r.n AS n))").alias(
            "steps"
        ),
    )
    st = F.expr(
        f"""aggregate(
            slice(steps, 2, size(steps) - 1),
            struct(steps[0].s AS p,
                   {CAP}L - least(steps[0].n, {CAP}L) AS tok,
                   steps[0].n - least(steps[0].n, {CAP}L) AS drp,
                   least(steps[0].n, {CAP}L) AS con),
            (acc, e) -> struct(
                e.s AS p,
                least(acc.tok + {REFILL} * (e.s - acc.p), {CAP}L)
                  - least(e.n, least(acc.tok + {REFILL} * (e.s - acc.p),
                                     {CAP}L)) AS tok,
                acc.drp + e.n
                  - least(e.n, least(acc.tok + {REFILL} * (e.s - acc.p),
                                     {CAP}L)) AS drp,
                acc.con + least(e.n, least(acc.tok + {REFILL} * (e.s - acc.p),
                                           {CAP}L)) AS con))"""
    )
    return staged.select(
        "event_type",
        "shard",
        "n_steps",
        st["con"].alias("total_consumed"),
        st["drp"].alias("total_dropped"),
        st["tok"].alias("final_tokens"),
    )


@register(
    "events_absence_alerts",
    oracle="""
    WITH last AS (
        SELECT event_type, user_id, max(ts) AS last_seen
        FROM events GROUP BY 1, 2
    ), now_t AS (
        SELECT max(ts) AS now FROM events
    )
    SELECT event_type, user_id, last_seen,
           CAST(date_diff('microsecond', last_seen, now)
                // 3600000000 AS BIGINT) AS silent_hours
    FROM last, now_t
    WHERE date_diff('microsecond', last_seen, now) >= 7 * 24 * 3600000000
    """,
)
def events_absence_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence / heartbeat alerting — the dead-man's-switch the proxy's
    alert engine fires when a stream STOPS reporting: per (stream,
    client), the last-seen timestamp vs the corpus "now" (its global
    max ts, for determinism), alerting where the silence is >= 7 days.
    Durations are computed in MICROSECONDS then floor-divided to hours
    — both engines count elapsed time, not calendar boundary crossings
    (DuckDB's date_diff('hour') counts crossings; the micros form
    sidesteps it). One keyed max agg + a broadcast 1-row now; exact
    integers throughout."""
    events = load_table(spark, sf_dir, "events")
    last = events.groupBy("event_type", "user_id").agg(
        F.max("ts").alias("last_seen")
    )
    now_t = events.agg(F.max("ts").alias("now"))
    silent_us = F.unix_micros("now") - F.unix_micros("last_seen")
    return (
        last.crossJoin(F.broadcast(now_t))
        .where(silent_us >= 7 * 24 * 3600 * 1_000_000)
        .select(
            "event_type",
            "user_id",
            "last_seen",
            F.expr(
                "(unix_micros(now) - unix_micros(last_seen)) div 3600000000"
            ).alias("silent_hours"),
        )
    )


def _lttb_exprs(t_pts: int = 12):
    """Shared structure of the LTTB fold for both engines (Spark SQL
    expression, DuckDB SQL expression), parameterized on the target
    point count. All arithmetic is INTEGER (indices as time axis,
    decimal-scaled values), so the triangle-area argmax is exact and
    engine-identical."""
    nb = t_pts - 2  # middle buckets
    # Spark side: n = size(vals), k = bucket, acc = selected indices
    lo = f"(1 + (k * (n - 2)) div {nb})"
    hi = f"(((k + 1) * (n - 2)) div {nb})"
    nlo = f"(CASE WHEN k = {nb - 1} THEN n - 1 ELSE 1 + ((k + 1) * (n - 2)) div {nb} END)"
    nhi = f"(CASE WHEN k = {nb - 1} THEN n - 1 ELSE ((k + 2) * (n - 2)) div {nb} END)"
    m = f"({nhi} - {nlo} + 1)"
    sum_t = f"(({m} * ({nlo} + {nhi})) div 2)"
    sum_v = f"aggregate(slice(vals, int({nlo} + 1), int({m})), 0L, (a, x) -> a + x)"
    p = "element_at(acc, -1)"
    pv = f"element_at(vals, int({p} + 1))"
    cv = "element_at(vals, int(i + 1))"
    score = (
        f"abs(({p} * {m} - {sum_t}) * ({cv} - {pv})"
        f" - ({p} - i) * ({sum_v} - {m} * {pv}))"
    )
    spark_expr = f"""
    aggregate(
      sequence(0L, {nb - 1}L),
      array(0L),
      (acc, k) -> concat(acc, array(element_at(
        aggregate(
          sequence({lo}, {hi}),
          array(-1L, -1L),
          (b, i) -> if({score} > element_at(b, 2), array(i, {score}), b)
        ), 1))),
      acc -> concat(acc, array(n - 1))
    )
    """
    # DuckDB side: same fold with positional-list accumulators.
    # GOTCHA (round 8): a list_reduce NESTED inside another
    # list_reduce's lambda returns nondeterministic garbage when the
    # query processes more than one row (even at threads=1) — the
    # inner argmax therefore uses list_transform + list_position(
    # list_max(...)) (first-max = earlier-index tie-break, matching
    # the Spark fold's strict >), which captures the outer acc safely.
    dlo = f"(1 + (e[1] * (n - 2)) // {nb})"
    dhi = f"(((e[1] + 1) * (n - 2)) // {nb})"
    dnlo = f"(CASE WHEN e[1] = {nb - 1} THEN n - 1 ELSE 1 + ((e[1] + 1) * (n - 2)) // {nb} END)"
    dnhi = f"(CASE WHEN e[1] = {nb - 1} THEN n - 1 ELSE ((e[1] + 2) * (n - 2)) // {nb} END)"
    dm = f"({dnhi} - {dnlo} + 1)"
    dsum_t = f"(({dm} * ({dnlo} + {dnhi})) // 2)"
    dsum_v = f"CAST(list_sum(list_slice(vals, {dnlo} + 1, {dnhi} + 1)) AS BIGINT)"
    dp = "acc[-1]"
    dpv = f"vals[{dp} + 1]"
    dcv = "vals[i + 1]"
    dscore = (
        f"abs(({dp} * {dm} - {dsum_t}) * ({dcv} - {dpv})"
        f" - ({dp} - i) * ({dsum_v} - {dm} * {dpv}))"
    )
    dscores = f"list_transform(generate_series({dlo}, {dhi}), i -> {dscore})"
    dinner = f"CAST({dlo} - 1 + list_position({dscores}, list_max({dscores})) AS BIGINT)"
    duck_expr = f"""
    list_append(
      list_reduce(
        list_prepend([CAST(0 AS BIGINT)],
          list_transform(generate_series(0, {nb - 1}), k -> [CAST(k AS BIGINT)])),
        (acc, e) -> list_append(acc, {dinner})
      ),
      n - 1)
    """
    return spark_expr, duck_expr


_LTTB_SPARK, _LTTB_DUCK = _lttb_exprs(12)


@register(
    "events_lttb_exact",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) * 10000 AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), series AS (
        SELECT event_type,
               list(v ORDER BY h) AS vals,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM hourly GROUP BY event_type
    ), sel AS (
        SELECT event_type, n, vals,
               {_LTTB_DUCK} AS picks
        FROM series WHERE n >= 12
    )
    SELECT event_type, n_hours, t_idx,
           CAST(vals[t_idx + 1] AS BIGINT) AS v_scaled
    FROM (
        -- single unnest only: two unnest() calls in one projection
        -- (one wrapped in an expression) silently mis-zip in DuckDB
        SELECT event_type, CAST(n AS BIGINT) AS n_hours, vals,
               CAST(unnest(picks) AS BIGINT) AS t_idx
        FROM sel
    )
    """,
)
def events_lttb_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling, ORACLE-EXACT flavor (round 8) — the
    value-checked twin of the rows-only `events_downsample_lttb`
    (applyInPandas over raw events): each per-type hourly series
    reduces to 12 points — endpoints fixed, each middle bucket contributing the
    point forming the largest triangle with the PREVIOUSLY selected
    point and the next bucket's average. The selection is inherently
    sequential (prev feeds the next triangle), so it runs as the
    recurrence family's fold: an integer-only `aggregate` whose
    accumulator is the selected-index list, with a nested argmax fold
    per bucket. Exactness levers: time axis = row index (integer),
    values = decimal-hourly-sums scaled x10^4 to BIGINT, bucket edges
    by integer division, and the triangle areas cleared of
    denominators (x|next bucket|), so every comparison is exact
    integer arithmetic in BOTH engines — ties break on the earlier
    index identically. Scale: one hourly rollup shuffle + one
    guarded_series collect per (type) group; the fold is
    O(series length) per group with bounded memory."""
    from metricproxy_spark.operators.scale import guarded_series

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (F.sum(F.col("value").cast("decimal(27,4)")) * 10000)
        .cast("bigint")
        .alias("v")
    )
    series = guarded_series(hourly, ["event_type"], ["h", "v"])
    sel = (
        series.select(
            "event_type",
            F.expr("transform(rows, r -> r.v)").alias("vals"),
            F.col("group_n").cast("bigint").alias("n"),
        )
        .where(F.col("n") >= 12)
        .select(
            "event_type",
            "n",
            "vals",
            F.expr(_LTTB_SPARK).alias("picks"),
        )
    )
    return sel.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.explode("picks").alias("t_idx"),
        "vals",
    ).select(
        "event_type",
        "n_hours",
        "t_idx",
        F.expr("element_at(vals, int(t_idx) + 1)").alias("v_scaled"),
    )


@register(
    "events_promql_rate",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS inc
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, h, inc,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                    - 1 AS BIGINT) AS hidx
        FROM hourly
    ), ctr AS (
        SELECT event_type, h, hidx // 37 AS seg,
               SUM(inc) OVER (PARTITION BY event_type, hidx // 37
                              ORDER BY h) AS v
        FROM idx
    ), lagged AS (
        SELECT event_type, h, v,
               date_trunc('day', h) AS day,
               CAST(epoch(h) AS BIGINT) AS t,
               lag(v) OVER (PARTITION BY event_type, date_trunc('day', h)
                            ORDER BY h) AS v_prev
        FROM ctr
    ), win AS (
        SELECT event_type, day,
               CAST(COUNT(*) AS BIGINT) AS n,
               min(t) AS t_first, max(t) AS t_last,
               min_by(v, t) AS v_first, max_by(v, t) AS v_last,
               SUM(CASE WHEN v < v_prev THEN v_prev
                        ELSE CAST(0 AS DECIMAL(38,4)) END) AS corr
        FROM lagged GROUP BY 1, 2
    ), calc AS (
        SELECT event_type, day, n,
               CAST(v_last - v_first + corr AS DOUBLE) AS delta,
               CAST(t_last - t_first AS DOUBLE) AS sampled,
               CAST(t_first - epoch(day) AS DOUBLE) AS dur_start0,
               CAST(epoch(day) + 86400 - t_last AS DOUBLE) AS dur_end,
               CAST(v_first AS DOUBLE) AS vf
        FROM win WHERE n >= 2
    ), calc2 AS (
        SELECT *,
               sampled / (n - 1) AS avg_dur,
               CASE WHEN delta > 0 AND vf >= 0
                    THEN least(dur_start0, sampled * (vf / delta))
                    ELSE dur_start0 END AS dur_start
        FROM calc
    )
    SELECT event_type, day, n AS n_samples, delta,
           delta * ((sampled
                + CASE WHEN dur_start < avg_dur * 1.1
                       THEN dur_start ELSE avg_dur / 2 END
                + CASE WHEN dur_end < avg_dur * 1.1
                       THEN dur_end ELSE avg_dur / 2 END)
               / sampled) / 86400.0 AS rate_per_s
    FROM calc2
    """,
)
def events_promql_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``rate()`` — the single most-used function of the
    dominant open metrics query language, with its REAL semantics, not
    the naive (last-first)/dt: per evaluation window, the increase is
    reset-corrected (a counter dropping below its predecessor
    contributes the predecessor, the monotonic-counter reconstruction),
    then EXTRAPOLATED to the window edges — each edge gap is added in
    full when smaller than 1.1x the average sample spacing, else half
    an average interval, and the start-side extrapolation is capped at
    the counter's zero-crossing estimate (delta>0 branch). Public
    algorithm: prometheus/promql functions.go extrapolatedRate.
    Synthetic counters: per-type hourly increment sums accumulated
    into segments that reset every 37 hours; windows = UTC days.
    Exactness: increments/counter/delta stay DECIMAL through every
    sum (order-independent), timestamps are integer seconds, and the
    extrapolation is one fixed IEEE expression over those identical
    operands — bit-equal across engines, no rounding discipline.
    Scale: one hourly rollup, two partitioned windows (segment cumsum,
    within-day lag), one hash agg per (type, day); the raw table is
    scanned once and nothing is driver-side."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("inc"))
    wo = Window.partitionBy("event_type").orderBy("h")
    idx = hourly.withColumn(
        "hidx", (F.row_number().over(wo) - 1).cast("bigint")
    ).withColumn("seg", F.expr("hidx div 37"))
    wseg = (
        Window.partitionBy("event_type", "seg")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = idx.withColumn("v", F.sum("inc").over(wseg)).withColumn(
        "day", F.date_trunc("day", "h")
    )
    wday = Window.partitionBy("event_type", "day").orderBy("h")
    lagged = ctr.select(
        "event_type",
        "day",
        F.unix_timestamp("h").alias("t"),
        "v",
        F.lag("v").over(wday).alias("v_prev"),
    )
    win = lagged.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("t").alias("t_first"),
        F.max("t").alias("t_last"),
        F.min_by("v", "t").alias("v_first"),
        F.max_by("v", "t").alias("v_last"),
        F.sum(
            F.when(F.col("v") < F.col("v_prev"), F.col("v_prev")).otherwise(
                F.lit(0).cast("decimal(38,4)")
            )
        ).alias("corr"),
    )
    calc = win.where(F.col("n") >= 2).select(
        "event_type",
        "day",
        "n",
        (F.col("v_last") - F.col("v_first") + F.col("corr"))
        .cast("double")
        .alias("delta"),
        (F.col("t_last") - F.col("t_first")).cast("double").alias("sampled"),
        (F.col("t_first") - F.unix_timestamp("day"))
        .cast("double")
        .alias("dur_start0"),
        (F.unix_timestamp("day") + 86400 - F.col("t_last"))
        .cast("double")
        .alias("dur_end"),
        F.col("v_first").cast("double").alias("vf"),
    )
    calc2 = calc.withColumn(
        "avg_dur", F.col("sampled") / (F.col("n") - 1)
    ).withColumn(
        "dur_start",
        F.when(
            (F.col("delta") > 0) & (F.col("vf") >= 0),
            F.least(
                F.col("dur_start0"),
                F.col("sampled") * (F.col("vf") / F.col("delta")),
            ),
        ).otherwise(F.col("dur_start0")),
    )
    extrap = (
        F.col("sampled")
        + F.when(
            F.col("dur_start") < F.col("avg_dur") * 1.1, F.col("dur_start")
        ).otherwise(F.col("avg_dur") / 2)
        + F.when(
            F.col("dur_end") < F.col("avg_dur") * 1.1, F.col("dur_end")
        ).otherwise(F.col("avg_dur") / 2)
    )
    return calc2.select(
        "event_type",
        "day",
        F.col("n").alias("n_samples"),
        "delta",
        (F.col("delta") * (extrap / F.col("sampled")) / F.lit(86400.0)).alias(
            "rate_per_s"
        ),
    )


@register(
    "events_histogram_quantile",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(floor(value / 5.0) AS BIGINT) AS bin,
               count(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ), weekly AS (
        SELECT event_type, date_trunc('week', day) AS week, bin,
               CAST(sum(cnt) AS BIGINT) AS cnt
        FROM daily GROUP BY 1, 2, 3
    ), cum AS (
        SELECT event_type, week, bin, cnt,
               CAST(sum(cnt) OVER (PARTITION BY event_type, week
                                   ORDER BY bin) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY event_type, week)
                    AS BIGINT) AS total
        FROM weekly
    ), phis AS (
        -- DOUBLE phis: newer DuckDB types the bare literals
        -- DECIMAL(3,2) and computes phi*total EXACTLY in decimal,
        -- a 1-ulp divergence from Spark's IEEE double product (the
        -- same lever the native-histogram quantile pins; found by
        -- exact-repr replay of the full registry)
        SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS phi
    ), hit AS (
        SELECT c.event_type, c.week, p.phi, c.total, c.bin, c.cnt, c.cum
        FROM cum c CROSS JOIN phis p
        WHERE c.cum >= p.phi * c.total
    )
    SELECT event_type, week, phi,
           CAST(max(total) AS BIGINT) AS n_events,
           min_by(bin * 5.0 + 5.0 * (phi * total - (cum - cnt)) / cnt, bin)
             AS q
    FROM hit GROUP BY 1, 2, 3
    """,
)
def events_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``histogram_quantile`` with in-bucket LINEAR INTERPOLATION —
    the PromQL/classic-histogram estimator, complementing
    `events_histogram_rollup`'s conservative lower-bin-edge flavor:
    within the first bucket whose cumulative count reaches rank =
    phi*total, the quantile interpolates q = lo + width*(rank -
    cum_prev)/cnt. Exactness: counts/cumulative counts are integers,
    bucket bounds are multiples of 5 — so q is ONE float expression
    over identical integer operands in both engines, bit-equal with
    no rounding discipline. Evaluated at phi in {0.5, 0.9, 0.99} per
    (type, week) over day->week MERGED histograms (histograms are
    monoids — the rollup never revisits raw data). Scale: the phi
    explode is a 3x literal flatmap; everything else is the histogram
    family's hash aggs + one bin-ordered window per (type, week)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.floor(F.col("value") / 5.0).cast("bigint").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    weekly = daily.groupBy(
        "event_type", F.date_trunc("week", "day").alias("week"), "bin"
    ).agg(F.sum("cnt").cast("bigint").alias("cnt"))
    wb = Window.partitionBy("event_type", "week").orderBy("bin")
    wall = Window.partitionBy("event_type", "week")
    cum = weekly.select(
        "event_type",
        "week",
        "bin",
        "cnt",
        F.sum("cnt").over(wb).cast("bigint").alias("cum"),
        F.sum("cnt").over(wall).cast("bigint").alias("total"),
    )
    hit = cum.crossJoin(
        F.broadcast(
            events.sparkSession.createDataFrame(
                [(0.5,), (0.9,), (0.99,)], "phi double"
            )
        )
    ).where(F.col("cum") >= F.col("phi") * F.col("total"))
    interp = (
        F.col("bin") * 5.0
        + 5.0
        * (F.col("phi") * F.col("total") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    return hit.groupBy("event_type", "week", "phi").agg(
        F.max("total").cast("bigint").alias("n_events"),
        F.min_by(interp, F.col("bin")).alias("q"),
    )


@register(
    "events_predict_linear",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               date_trunc('day', ts) AS day,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2, 3
    ), rel AS (
        -- time axis relative to the window END (the PromQL
        -- evaluation-time reference): small integers, exact products
        SELECT event_type, day, v,
               CAST(epoch(h) - (epoch(day) + 86400) AS BIGINT) AS t
        FROM hourly
    ), sums AS (
        SELECT event_type, day,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(t) AS st,
               SUM(t * t) AS stt,
               SUM(v) AS sv,
               SUM(CAST(t AS DECIMAL(38,4)) * v) AS stv
        FROM rel GROUP BY 1, 2
    ), fit AS (
        SELECT event_type, day, n,
               CAST(n * stv - st * sv AS DOUBLE)
                 / CAST(n * stt - st * st AS DOUBLE) AS slope,
               CAST(sv AS DOUBLE) AS svd, CAST(st AS DOUBLE) AS std
        FROM sums WHERE n >= 2 AND n * stt - st * st <> 0
    )
    SELECT event_type, day, n AS n_samples, slope,
           (svd - slope * std) / n + slope * 3600.0 AS predicted_1h
    FROM fit
    """,
)
def events_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``predict_linear`` — simple least squares per evaluation
    window, extrapolated one hour past the window end (the capacity-
    planning / disk-will-fill alert primitive). Exactness: with the
    time axis recentered on the window END (PromQL's evaluation-time
    reference) every regression sum is EXACT — t, t² are integers, v
    and t·v are decimals — so slope is one division of identical
    operands and the prediction is one fixed IEEE chain: bit-equal in
    both engines with no tolerance. Degenerate windows (n<2 or zero
    time variance) are excluded on both sides. Scale: one hourly
    rollup + one hash agg per (type, day); sums are map-combinable, so
    the regression state per group is five numbers regardless of
    window length."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    rel = hourly.select(
        "event_type",
        "day",
        "v",
        (F.unix_timestamp("h") - (F.unix_timestamp("day") + 86400))
        .cast("bigint")
        .alias("t"),
    )
    sums = rel.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("v").alias("sv"),
        F.sum(F.col("t").cast("decimal(38,4)") * F.col("v")).alias("stv"),
    )
    fit = sums.where(
        (F.col("n") >= 2)
        & (F.col("n") * F.col("stt") - F.col("st") * F.col("st") != 0)
    ).select(
        "event_type",
        "day",
        "n",
        (
            (F.col("n") * F.col("stv") - F.col("st") * F.col("sv")).cast(
                "double"
            )
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
                "double"
            )
        ).alias("slope"),
        F.col("sv").cast("double").alias("svd"),
        F.col("st").cast("double").alias("std"),
    )
    return fit.select(
        "event_type",
        "day",
        F.col("n").alias("n_samples"),
        "slope",
        (
            (F.col("svd") - F.col("slope") * F.col("std")) / F.col("n")
            + F.col("slope") * F.lit(3600.0)
        ).alias("predicted_1h"),
    )


@register(
    "events_gorilla_roundtrip",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS t,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) * 10000 AS BIGINT) AS v
        FROM events GROUP BY 1, 2, date_trunc('hour', ts)
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(t) AS BIGINT) AS sum_ts,
           CAST(SUM(v) AS BIGINT) AS sum_v_scaled
    FROM hourly GROUP BY 1, 2
    """,
)
def events_gorilla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla TSDB chunk compression (VLDB'15 §4.1 — the codec behind
    Prometheus-class chunk storage) driven end to end: per (type, day)
    the hourly series compresses through delta-of-delta timestamps +
    XOR float values and decompresses back; the query sums the DECODED
    points. Gorilla is LOSSLESS, so the oracle is simply the direct
    rollup of the input series (the FLAC lever) — values ride as
    decimal-exact x10^4 integers stored in float64, so the decoded
    sums are pure integer arithmetic. The per-day first delta can span
    a multi-hour gap, so blocks use the self-describing 17-bit
    first-delta header (the paper's 14 assumes 2-hour blocks).
    Compression-ratio properties are pinned in tests/test_gorilla.py.
    Scale: one hourly rollup + guarded per-(type, day) series collect;
    the codec itself is a map-only Arrow stage, ~150 small blocks
    here, one block per series-day at any scale."""
    import numpy as np
    import pandas as pd

    from metricproxy_spark.io import ensure_package_on_workers
    from metricproxy_spark.operators.scale import guarded_series

    ensure_package_on_workers(spark)
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.unix_timestamp(F.date_trunc("hour", "ts")).cast("bigint").alias("t"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(27,4)")) * 10000)
        .cast("bigint")
        .alias("v")
    )
    series = guarded_series(hourly, ["event_type", "day"], ["t", "v"])

    def work(batches):
        from metricproxy_spark.operators.gorilla import (
            compress_gorilla,
            decompress_gorilla,
        )

        for pdf in batches:
            out = []
            for et, day, rows in zip(
                pdf["event_type"], pdf["day"], pdf["rows"]
            ):
                t = np.array([r["t"] for r in rows], np.int64)
                v = np.array([r["v"] for r in rows], np.float64)
                td, vd = decompress_gorilla(
                    compress_gorilla(t, v, first_delta_bits=17)
                )
                out.append(
                    (
                        et,
                        day,
                        len(td),
                        int(td.sum()),
                        int(vd.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "event_type", "day", "n_points", "sum_ts", "sum_v_scaled",
                ],
            )

    return series.select("event_type", "day", "rows").mapInPandas(
        work,
        "event_type string, day timestamp, n_points bigint,"
        " sum_ts bigint, sum_v_scaled bigint",
    )


@register(
    "events_promql_changes",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS inc
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, h, inc,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                    - 1 AS BIGINT) AS hidx
        FROM hourly
    ), ctr AS (
        SELECT event_type, h, date_trunc('day', h) AS day,
               SUM(inc) OVER (PARTITION BY event_type, hidx // 37
                              ORDER BY h) AS v
        FROM idx
    ), lagged AS (
        SELECT event_type, day, v,
               lag(v) OVER (PARTITION BY event_type, day ORDER BY h) AS vp
        FROM ctr
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(CASE WHEN vp IS NOT NULL AND v <> vp
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
           CAST(SUM(CASE WHEN v < vp THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resets
    FROM lagged GROUP BY 1, 2
    """,
)
def events_promql_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``changes()`` and ``resets()`` — the counter-health
    diagnostics beside `events_promql_rate` (same synthetic counters,
    same windows): per (type, day), changes counts consecutive-sample
    value changes and resets counts drops below the predecessor (the
    restart detector alerting keys on). Pure integer comparisons over
    DECIMAL counter levels — exact with no discipline. Scale: shares
    rate()'s shape — one hourly rollup, two partitioned windows, one
    hash agg; the comparisons add nothing wide."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("inc"))
    wo = Window.partitionBy("event_type").orderBy("h")
    idx = hourly.withColumn(
        "hidx", (F.row_number().over(wo) - 1).cast("bigint")
    ).withColumn("seg", F.expr("hidx div 37"))
    wseg = (
        Window.partitionBy("event_type", "seg")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = idx.withColumn("v", F.sum("inc").over(wseg)).withColumn(
        "day", F.date_trunc("day", "h")
    )
    wday = Window.partitionBy("event_type", "day").orderBy("h")
    lagged = ctr.select(
        "event_type", "day", "v", F.lag("v").over(wday).alias("vp")
    )
    return lagged.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum(
            F.when(
                F.col("vp").isNotNull() & (F.col("v") != F.col("vp")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changes"),
        F.sum(F.when(F.col("v") < F.col("vp"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_resets"),
    )


@register(
    "events_promql_over_time",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), win AS (
        SELECT event_type, date_trunc('day', h) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(v) AS s,
               SUM(CAST(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4))
                        AS DECIMAL(38,8))) AS s2,
               MIN(v) AS mn, MAX(v) AS mx,
               max_by(v, h) AS lst
        FROM hourly GROUP BY 1, 2
    )
    SELECT event_type, day,
           n AS n_samples,
           CAST(s AS DOUBLE) AS sum_ot,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS avg_ot,
           CAST(mn AS DOUBLE) AS min_ot,
           CAST(mx AS DOUBLE) AS max_ot,
           CAST(lst AS DOUBLE) AS last_ot,
           (CAST(s2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE) AS stdvar_ot
    FROM win
    """,
)
def events_promql_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``*_over_time`` gauge aggregations — the family a real
    PromQL user hits daily (`avg_over_time`, `min/max_over_time`,
    `sum/count_over_time`, `last_over_time`, `stdvar_over_time`), per
    (series, window) with series = event_type hourly gauge and window
    = UTC day, completing the round-8 counter family
    (`events_promql_rate`). Public algorithm: prometheus/promql
    functions.go (funcAvgOverTime et al.; stdvar is POPULATION
    variance). Exactness: every statistic is either a DECIMAL sum /
    selection cast to double, or ONE fixed IEEE expression over those
    exact operands — avg = s/n, stdvar = (s2 - s*s/n)/n with the
    second moment accumulated in DECIMAL(38,8) — bit-equal across
    engines with no rounding discipline. Scale: one hourly rollup +
    one (type, day) hash agg, both map-side combinable; the raw table
    is scanned once, nothing driver-side."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    v18 = F.col("v").cast("decimal(18,4)")
    win = hourly.groupBy(
        "event_type", F.date_trunc("day", "h").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("s"),
        F.sum((v18 * v18).cast("decimal(38,8)")).alias("s2"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.max_by("v", "h").alias("lst"),
    )
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    return win.select(
        "event_type",
        "day",
        F.col("n").alias("n_samples"),
        sd.alias("sum_ot"),
        (sd / nd).alias("avg_ot"),
        F.col("mn").cast("double").alias("min_ot"),
        F.col("mx").cast("double").alias("max_ot"),
        F.col("lst").cast("double").alias("last_ot"),
        (
            (F.col("s2").cast("double") - sd * sd / nd) / nd
        ).alias("stdvar_ot"),
    )


@register(
    "events_promql_quantile_over_time",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS vd
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, date_trunc('day', h) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           quantile_cont(vd, 0.5) AS q50,
           quantile_cont(vd, 0.9) AS q90,
           quantile_cont(vd, 0.99) AS q99
    FROM hourly GROUP BY 1, 2
    """,
)
def events_promql_quantile_over_time(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PromQL ``quantile_over_time(q, ...)`` at q = 0.5/0.9/0.99 per
    (series, window) — the latency-SLO workhorse. Both engines define
    the continuous quantile identically (sorted samples, linear
    interpolation at rank q*(n-1): Spark `percentile`, DuckDB
    `quantile_cont`), and the interpolation is one fixed IEEE
    expression over the same float64 samples, so the result is
    bit-equal cross-engine — probed on awkward irrational-ish values
    this round, 6/6 quantiles identical. The gauge samples are the
    hourly DECIMAL sums cast to double (exact cast, 4dp). Public
    algorithm: prometheus/promql functions.go funcQuantileOverTime.
    Scale: one hourly rollup + one (type, day) agg; percentile's
    per-group state is the 24-sample window — bounded by the window
    width, not the table."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.col("value").cast("decimal(27,4)"))
        .cast("double")
        .alias("vd")
    )
    return hourly.groupBy(
        "event_type", F.date_trunc("day", "h").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.percentile("vd", F.lit(0.5)).alias("q50"),
        F.percentile("vd", F.lit(0.9)).alias("q90"),
        F.percentile("vd", F.lit(0.99)).alias("q99"),
    )


@register(
    "events_promql_topk",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               SUM(CAST(value AS DECIMAL(27,4))) AS s
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT day, event_type, s,
               row_number() OVER (PARTITION BY day
                                  ORDER BY s DESC, event_type) AS rt,
               row_number() OVER (PARTITION BY day
                                  ORDER BY s ASC, event_type) AS rb
        FROM daily
    )
    SELECT day, 'top' AS direction, CAST(rt AS INT) AS rnk,
           event_type, CAST(s AS DOUBLE) AS val
    FROM ranked WHERE rt <= 3
    UNION ALL
    SELECT day, 'bottom' AS direction, CAST(rb AS INT) AS rnk,
           event_type, CAST(s AS DOUBLE) AS val
    FROM ranked WHERE rb <= 3
    """,
)
def events_promql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``topk(3, ...)`` and ``bottomk(3, ...)`` over the
    instant vector `sum by (event_type)` at each day boundary — the
    dashboard "noisiest/quietest series" selector. Ranking compares
    DECIMAL daily sums (exact, order-independent) with the series
    label as deterministic tie-break, so the selection is value-exact
    cross-engine; both directions rank the SAME aggregated frame, so
    the daily rollup computes once. Public algorithm:
    prometheus/promql engine.go (topk/bottomk heaps). Scale: one
    (day, type) hash agg, two row_number windows partitioned by day
    over the tiny aggregate, never the raw table."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("s"))
    ranked = daily.select(
        "day",
        "event_type",
        "s",
        F.row_number()
        .over(
            Window.partitionBy("day").orderBy(
                F.col("s").desc(), F.col("event_type")
            )
        )
        .alias("rt"),
        F.row_number()
        .over(
            Window.partitionBy("day").orderBy(
                F.col("s").asc(), F.col("event_type")
            )
        )
        .alias("rb"),
    )
    val = F.col("s").cast("double").alias("val")
    top = ranked.where(F.col("rt") <= 3).select(
        "day",
        F.lit("top").alias("direction"),
        F.col("rt").cast("int").alias("rnk"),
        "event_type",
        val,
    )
    bot = ranked.where(F.col("rb") <= 3).select(
        "day",
        F.lit("bottom").alias("direction"),
        F.col("rb").cast("int").alias("rnk"),
        "event_type",
        val,
    )
    return top.unionByName(bot)


@register(
    "events_promql_delta",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               date_trunc('day', ts) AS day,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2, 3
    ), lagged AS (
        SELECT event_type, day, v,
               CAST(epoch(h) AS BIGINT) AS t,
               lag(v) OVER (PARTITION BY event_type, day ORDER BY h) AS vp
        FROM hourly
    ), win AS (
        SELECT event_type, day,
               CAST(COUNT(*) AS BIGINT) AS n,
               min(t) AS t_first, max(t) AS t_last,
               min_by(v, t) AS v_first, max_by(v, t) AS v_last,
               max_by(vp, t) AS v_prev_of_last
        FROM lagged GROUP BY 1, 2
    ), calc AS (
        SELECT event_type, day, n,
               CAST(v_last - v_first AS DOUBLE) AS dv,
               CAST(v_last - v_prev_of_last AS DOUBLE) AS idelta_v,
               CAST(t_last - t_first AS DOUBLE) AS sampled,
               CAST(t_first - epoch(day) AS DOUBLE) AS dur_start,
               CAST(epoch(day) + 86400 - t_last AS DOUBLE) AS dur_end
        FROM win WHERE n >= 2
    ), calc2 AS (
        SELECT *, sampled / (n - 1) AS avg_dur FROM calc
    )
    SELECT event_type, day, n AS n_samples, idelta_v,
           dv * ((sampled
                + CASE WHEN dur_start < avg_dur * 1.1
                       THEN dur_start ELSE avg_dur / 2 END
                + CASE WHEN dur_end < avg_dur * 1.1
                       THEN dur_end ELSE avg_dur / 2 END)
               / sampled) AS delta_v
    FROM calc2
    """,
)
def events_promql_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``delta()`` and ``idelta()`` on GAUGES — the
    first-vs-last window difference with rate()'s edge extrapolation
    but WITHOUT the counter machinery (no reset correction, no
    zero-crossing cap: gauges go down legitimately), and the
    instantaneous last-minus-previous-sample difference. Public
    algorithm: prometheus/promql functions.go extrapolatedRate with
    isCounter=false, isRate=false (delta) and funcIdelta. Series =
    per-type hourly DECIMAL gauge; windows = UTC days. Exactness:
    differences are DECIMAL selections, timestamps integer seconds,
    and the extrapolation is one fixed IEEE expression over those
    exact operands — bit-equal cross-engine. Scale: one hourly
    rollup, one within-day lag window, one (type, day) hash agg."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    wday = Window.partitionBy("event_type", "day").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "day",
        "v",
        F.unix_timestamp("h").cast("bigint").alias("t"),
        F.lag("v").over(wday).alias("vp"),
    )
    win = lagged.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("t").alias("t_first"),
        F.max("t").alias("t_last"),
        F.min_by("v", "t").alias("v_first"),
        F.max_by("v", "t").alias("v_last"),
        F.max_by("vp", "t").alias("v_prev_of_last"),
    )
    calc = win.where(F.col("n") >= 2).select(
        "event_type",
        "day",
        "n",
        (F.col("v_last") - F.col("v_first")).cast("double").alias("dv"),
        (F.col("v_last") - F.col("v_prev_of_last"))
        .cast("double")
        .alias("idelta_v"),
        (F.col("t_last") - F.col("t_first")).cast("double").alias("sampled"),
        (F.col("t_first") - F.unix_timestamp("day"))
        .cast("double")
        .alias("dur_start"),
        (F.unix_timestamp("day") + 86400 - F.col("t_last"))
        .cast("double")
        .alias("dur_end"),
    )
    calc2 = calc.withColumn("avg_dur", F.col("sampled") / (F.col("n") - 1))
    extrap = (
        F.col("sampled")
        + F.when(
            F.col("dur_start") < F.col("avg_dur") * 1.1, F.col("dur_start")
        ).otherwise(F.col("avg_dur") / 2)
        + F.when(
            F.col("dur_end") < F.col("avg_dur") * 1.1, F.col("dur_end")
        ).otherwise(F.col("avg_dur") / 2)
    )
    return calc2.select(
        "event_type",
        "day",
        F.col("n").alias("n_samples"),
        "idelta_v",
        (F.col("dv") * (extrap / F.col("sampled"))).alias("delta_v"),
    )


@register(
    "events_promql_irate",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS inc
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, h, inc,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                    - 1 AS BIGINT) AS hidx
        FROM hourly
    ), ctr AS (
        SELECT event_type, h, date_trunc('day', h) AS day,
               CAST(epoch(h) AS BIGINT) AS t,
               SUM(inc) OVER (PARTITION BY event_type, hidx // 37
                              ORDER BY h) AS v
        FROM idx
    ), lagged AS (
        SELECT event_type, day, t, v,
               lag(v) OVER (PARTITION BY event_type, day ORDER BY h) AS vp,
               lag(t) OVER (PARTITION BY event_type, day ORDER BY h) AS tp
        FROM ctr
    ), last2 AS (
        SELECT event_type, day,
               CAST(COUNT(*) AS BIGINT) AS n,
               max_by(v, t) AS v_last, max_by(vp, t) AS v_prev,
               max(t) AS t_last, max_by(tp, t) AS t_prev
        FROM lagged GROUP BY 1, 2
    )
    SELECT event_type, day, n AS n_samples,
           CAST(CASE WHEN v_last >= v_prev THEN v_last - v_prev
                     ELSE v_last END AS DOUBLE)
             / CAST(t_last - t_prev AS DOUBLE) AS irate_per_s
    FROM last2 WHERE n >= 2
    """,
)
def events_promql_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``irate()`` — the instant rate from the LAST TWO counter
    samples of each window (the fast-moving-counter companion to
    `events_promql_rate`, same synthetic 37-hour-reset counters, same
    UTC-day windows), with the counter-reset rule: a drop below the
    previous sample means the counter restarted, so the increase is
    the raw new value. Public algorithm: prometheus/promql
    functions.go instantValue. Exactness: the last two samples are
    selections (max_by over integer timestamps), the increase is a
    DECIMAL subtraction, and the rate is one division of exact
    operands. Scale: shares rate()'s shape — one hourly rollup, two
    partitioned windows, one hash agg; only two samples per group
    survive the agg."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("inc"))
    wo = Window.partitionBy("event_type").orderBy("h")
    idx = hourly.withColumn(
        "hidx", (F.row_number().over(wo) - 1).cast("bigint")
    ).withColumn("seg", F.expr("hidx div 37"))
    wseg = (
        Window.partitionBy("event_type", "seg")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = idx.withColumn("v", F.sum("inc").over(wseg)).withColumn(
        "day", F.date_trunc("day", "h")
    ).withColumn("t", F.unix_timestamp("h").cast("bigint"))
    wday = Window.partitionBy("event_type", "day").orderBy("h")
    lagged = ctr.select(
        "event_type",
        "day",
        "t",
        "v",
        F.lag("v").over(wday).alias("vp"),
        F.lag("t").over(wday).alias("tp"),
    )
    last2 = lagged.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max_by("v", "t").alias("v_last"),
        F.max_by("vp", "t").alias("v_prev"),
        F.max("t").alias("t_last"),
        F.max_by("tp", "t").alias("t_prev"),
    )
    inc = F.when(
        F.col("v_last") >= F.col("v_prev"),
        F.col("v_last") - F.col("v_prev"),
    ).otherwise(F.col("v_last"))
    return last2.where(F.col("n") >= 2).select(
        "event_type",
        "day",
        F.col("n").alias("n_samples"),
        (
            inc.cast("double")
            / (F.col("t_last") - F.col("t_prev")).cast("double")
        ).alias("irate_per_s"),
    )


@register(
    "events_sax_symbols",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) // 4 AS seg,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2, 3
    ), segs AS (
        SELECT event_type, day, seg, SUM(v) AS sv,
               SUM(SUM(v)) OVER (PARTITION BY event_type, day) AS total,
               SUM(CAST(1 AS BIGINT))
                 OVER (PARTITION BY event_type, day) AS n_segs
        FROM hourly GROUP BY 1, 2, 3
    ), sym AS (
        SELECT event_type, day, seg, total, n_segs,
               CASE WHEN 12 * sv < total THEN 'a'
                    WHEN 6 * sv < total THEN 'b'
                    WHEN 4 * sv < total THEN 'c'
                    ELSE 'd' END AS s
        FROM segs
    )
    SELECT event_type, day,
           string_agg(s, '' ORDER BY seg) AS sax,
           CAST(max(n_segs) AS BIGINT) AS n_segments,
           CAST(max(total) AS DOUBLE) AS day_total
    FROM sym GROUP BY 1, 2
    """,
)
def events_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolization (Lin et al. 2003 "Symbolic Aggregate
    approXimation") — each day's series reduces to Piecewise Aggregate
    Approximation segments (6 four-hour buckets) and each segment
    quantizes to a letter by its share of the day's mass: the
    dimensionality-reduction front-end of symbolic motif/anomaly
    search over TSDB archives. Quantization thresholds are the
    share-of-mean bands 0.5x/1.0x/1.5x, evaluated as pure DECIMAL
    integer-multiple comparisons (12·seg < total etc. — no division,
    no floats), so the symbol strings are hash-exact cross-engine.
    Scale: two nested hash aggs (hour -> segment) + one per-(type,
    day) window over 6-row groups + an ordered string fold — the raw
    table is scanned once; the output is ~|series|x|days| short
    strings, the index a motif store would ingest."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("CAST(hour(ts) AS BIGINT) div 4").alias("seg"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    wday = Window.partitionBy("event_type", "day")
    segs = hourly.groupBy("event_type", "day", "seg").agg(
        F.sum("v").alias("sv")
    ).select(
        "event_type",
        "day",
        "seg",
        "sv",
        F.sum("sv").over(wday).alias("total"),
        F.count(F.lit(1)).over(wday).cast("bigint").alias("n_segs"),
    )
    sym = segs.withColumn(
        "s",
        F.when(12 * F.col("sv") < F.col("total"), "a")
        .when(6 * F.col("sv") < F.col("total"), "b")
        .when(4 * F.col("sv") < F.col("total"), "c")
        .otherwise("d"),
    )
    return sym.groupBy("event_type", "day").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seg", "s"))
                ),
                lambda x: x["s"],
            ),
        ).alias("sax"),
        F.max("n_segs").cast("bigint").alias("n_segments"),
        F.max("total").cast("double").alias("day_total"),
    )


@register(
    "events_exp_histogram",
    oracle="""
    WITH pts AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(CAST(value AS DECIMAL(27,4)) * 10000 AS BIGINT) AS v
        FROM events
    ), daily AS (
        SELECT event_type, day,
               CAST(length(bin(v)) - 1 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pts WHERE v > 0 GROUP BY 1, 2, 3
    ), weekly AS (
        SELECT event_type, date_trunc('week', day) AS week, bucket,
               CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM daily GROUP BY 1, 2, 3
    )
    SELECT event_type, week, bucket, cnt,
           CAST(SUM(cnt) OVER (PARTITION BY event_type, week
                               ORDER BY bucket) AS BIGINT) AS cum,
           CAST((CAST(1 AS BIGINT) << bucket) AS BIGINT) AS bucket_lo,
           CAST((CAST(1 AS BIGINT) << (bucket + 1)) AS BIGINT) AS bucket_hi
    FROM weekly
    """,
)
def events_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP EXPONENTIAL histogram (OpenTelemetry metrics data model
    §ExponentialHistogram at scale 0) — base-2 buckets whose index is
    floor(log2(v)), the histogram type OTLP agents negotiate for
    latency distributions because bucket boundaries need no
    configuration and merge across scales. Values land in integer
    space (x10000 via DECIMAL — exact) and the bucket index is
    length(bin(v)) - 1, i.e. bit-length minus one: floor(log2) with
    ZERO floating-point anywhere, so the whole histogram — daily
    build, day -> week monoid merge, cumulative counts, power-of-two
    bucket bounds via integer shifts — is hash-exact cross-engine.
    (A float log2 would disagree at bucket boundaries; the bit-length
    trick is the exactness lever.) Complements the fixed-width
    `events_histogram_rollup` and the interpolating
    `events_histogram_quantile`. Scale: two nested hash aggs + one
    bucket-ordered window per (type, week) over ~20-row groups."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        (F.col("value").cast("decimal(27,4)") * 10000)
        .cast("bigint")
        .alias("v"),
    ).where(F.col("v") > 0)
    daily = pts.groupBy(
        "event_type",
        "day",
        (F.length(F.bin("v")) - 1).cast("bigint").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    weekly = daily.groupBy(
        "event_type", F.date_trunc("week", "day").alias("week"), "bucket"
    ).agg(F.sum("cnt").cast("bigint").alias("cnt"))
    wb = Window.partitionBy("event_type", "week").orderBy("bucket")
    return weekly.select(
        "event_type",
        "week",
        "bucket",
        "cnt",
        F.sum("cnt").over(wb).cast("bigint").alias("cum"),
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"
            " AS BIGINT)"
        ).alias("bucket_lo"),
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket + 1 AS INT))"
            " AS BIGINT)"
        ).alias("bucket_hi"),
    )


@register(
    "events_time_range_frame",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, h,
           CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
               RANGE BETWEEN INTERVAL 3 HOUR PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS rolling_4h_sum,
           CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY h
               RANGE BETWEEN INTERVAL 3 HOUR PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_in_frame,
           CAST(MAX(v) OVER (PARTITION BY event_type ORDER BY h
               RANGE BETWEEN INTERVAL 3 HOUR PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS rolling_4h_max
    FROM hourly
    """,
)
def events_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE window frames — `RANGE BETWEEN INTERVAL ... 
    PRECEDING` over a timestamp ORDER BY, the sliding-window idiom
    over IRREGULAR samples that row-count frames get wrong (a
    3-hours-ago bound is a time predicate, not a row offset; both
    engines probed this round: identical inclusive-bound semantics).
    Rolling 4-hour decimal sum/count/max per series completes the X14
    frame family beside the numeric `rangeBetween` query. Exactness:
    DECIMAL sums + selections over an integer-hour axis. Scale: one
    hourly rollup + one partitioned window — frame evaluation is a
    per-partition ordered scan, never a self-join."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    # RANGE INTERVAL '3' HOUR PRECEDING as an epoch-second range frame
    # (hour timestamps are exact integer seconds — identical bounds);
    # pure DataFrame API, no session-global temp view (ADVICE r10's
    # concurrent-invocation hazard class).
    w3 = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("h"))
        .rangeBetween(-3 * 3600, 0)
    )
    return hourly.select(
        "event_type",
        "h",
        F.sum("v").over(w3).cast("double").alias("rolling_4h_sum"),
        F.count(F.lit(1)).over(w3).cast("bigint").alias("n_in_frame"),
        F.max("v").over(w3).cast("double").alias("rolling_4h_max"),
    )


@register(
    "events_promql_label_ops",
    oracle="""
    WITH series AS (
        SELECT DISTINCT event_type,
               CAST(user_id AS VARCHAR) AS user_lbl
        FROM events
    ), replaced AS (
        SELECT event_type, user_lbl,
               CASE WHEN regexp_matches(event_type, '^(cl|si)(.*)$')
                    THEN regexp_replace(event_type, '^(cl|si)(.*)$',
                                        'grp-\\1', 'g')
                    ELSE event_type END AS family,
               event_type || '/' || user_lbl AS joined
        FROM series
    )
    SELECT family,
           CAST(COUNT(*) AS BIGINT) AS n_series,
           min(joined) AS first_joined,
           max(joined) AS last_joined
    FROM replaced GROUP BY 1
    """,
)
def events_promql_label_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``label_replace()`` and ``label_join()`` — the vector
    label-manipulation pair dashboards lean on for regrouping:
    label_replace writes capture-group expansions into a destination
    label ONLY when the regex matches the source value IN FULL
    (anchored — unmatched series pass through unchanged, the
    documented no-op contract), and label_join concatenates label
    values with a separator. Series whose type starts 'cl'/'si'
    regroup under 'grp-<prefix>'; the rest keep their name. Public
    algorithm: prometheus/promql functions.go funcLabelReplace /
    funcLabelJoin. Exactness: pure string ops in the shared regex
    dialect (full-anchor + capture; Spark `$1` / DuckDB `\\1`),
    grouped counts + min/max joined labels value-check the rewrite.
    Scale: map-side rewrite over the distinct series atom + one hash
    agg."""
    events = load_table(spark, sf_dir, "events")
    series = events.select(
        "event_type", F.col("user_id").cast("string").alias("user_lbl")
    ).distinct()
    pat = r"^(cl|si)(.*)$"
    replaced = series.select(
        F.when(
            F.regexp_like("event_type", F.lit(pat)),
            F.regexp_replace("event_type", pat, r"grp-$1"),
        )
        .otherwise(F.col("event_type"))
        .alias("family"),
        F.concat_ws("/", "event_type", "user_lbl").alias("joined"),
    )
    return replaced.groupBy("family").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_series"),
        F.min("joined").alias("first_joined"),
        F.max("joined").alias("last_joined"),
    )


@register(
    "events_promql_absent",
    oracle="""
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), watched AS (
        SELECT t.event_type, u.user_id, d.day
        FROM types t
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS user_id) u
        CROSS JOIN days d
    ), present AS (
        SELECT DISTINCT event_type, user_id, date_trunc('day', ts) AS day
        FROM events WHERE user_id <= 9
    )
    SELECT w.event_type, CAST(w.user_id AS BIGINT) AS user_id, w.day,
           (p.event_type IS NULL) AS is_absent
    FROM watched w LEFT JOIN present p
      ON w.event_type = p.event_type AND w.user_id = p.user_id
         AND w.day = p.day
    """,
)
def events_promql_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``absent_over_time()`` — the alert primitive that fires
    when a WATCHED series produces NO samples in the window (the only
    way to alert on a dead exporter: every other function returns
    nothing when the series vanishes). The watch list is the expected
    grid (every type x users 0-9) crossed with every observed day;
    absence = anti-membership of the per-day present set. Public
    algorithm: prometheus/promql functions.go funcAbsentOverTime
    (plus the absent-alert idiom). Pure set algebra over integer
    keys — exact. Scale: the watch list is |types|x10 literal-sized
    crossed with the day atom (both tiny, broadcast); presence is one
    distinct over the filtered scan and a left join keyed by the
    watch grid."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(F.date_trunc("day", "ts").alias("day")).distinct()
    types = events.select("event_type").distinct()
    users = spark.range(0, 10).select(F.col("id").alias("user_id"))
    watched = types.crossJoin(users).crossJoin(days)
    present = (
        events.where(F.col("user_id") <= 9)
        .select(
            "event_type",
            "user_id",
            F.date_trunc("day", "ts").alias("day"),
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return watched.join(
        present, ["event_type", "user_id", "day"], "left"
    ).select(
        "event_type",
        F.col("user_id").cast("bigint").alias("user_id"),
        "day",
        F.col("hit").isNull().alias("is_absent"),
    )


@register(
    "events_activity_heatmap",
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2, 3
    """,
)
def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x day-of-week activity HEATMAP — the dashboard
    grid behind every 'when is traffic hot' panel: per (series,
    ISO weekday 1-7, hour 0-23) event counts, decimal-exact value
    sums, and distinct-user cardinality. ISO weekday (Monday = 1) is
    the cross-engine-stable day numbering (Spark `dayofweek` is
    Sunday = 1 — use `EXTRACT(DAYOFWEEK_ISO)` / DuckDB isodow).
    Scale: one hash agg straight off the scan; the distinct-user
    count is the only expansion and is bounded by the grid x user
    cardinality."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type",
        F.expr("CAST(EXTRACT(DAYOFWEEK_ISO FROM ts) AS BIGINT)").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "events_quantile_disc",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               date_trunc('day', ts) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS vd
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           quantile_disc(vd, 0.25) AS q25_disc,
           quantile_disc(vd, 0.50) AS q50_disc,
           quantile_disc(vd, 0.75) AS q75_disc
    FROM hourly GROUP BY 1, 2
    """,
)
def events_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE quantiles (SQL `percentile_disc` semantics — the
    answer must be an OBSERVED sample, the rule compliance/latency
    reporting often mandates, vs the interpolating
    `events_promql_quantile_over_time`): the element at 1-based rank
    ceil(q*n) in sort order, probed this round as DuckDB
    quantile_disc's exact rule. Spark side implements the rule
    literally — one ordered row_number window + group size, then a
    conditional selection per q — so the semantics are pinned by
    construction, not by a black-box builtin. All three q values are
    DYADIC (0.25/0.5/0.75), making ceil(q*n) float-hazard-free at any
    n. Scale: one hourly rollup + one partitioned window + one hash
    agg; the window input is day-sized per series."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(27,4)"))
        .cast("double")
        .alias("vd")
    )
    wday = Window.partitionBy("event_type", "day").orderBy("vd", "h")
    wall = Window.partitionBy("event_type", "day")
    ranked = hourly.select(
        "event_type",
        "day",
        "vd",
        F.row_number().over(wday).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )

    def disc(q: float, name: str):
        rank = F.greatest(F.ceil(F.lit(q) * F.col("n")), F.lit(1))
        return F.max(F.when(F.col("rn") == rank, F.col("vd"))).alias(name)

    return ranked.groupBy("event_type", "day").agg(
        F.max("n").cast("bigint").alias("n_samples"),
        disc(0.25, "q25_disc"),
        disc(0.50, "q50_disc"),
        disc(0.75, "q75_disc"),
    )


@register(
    "events_promql_binop_ratio",
    oracle="""
    WITH errors AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS err_n
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ), requests AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS req_n
        FROM events GROUP BY 1, 2
    )
    SELECT e.user_id, e.day, e.err_n, r.req_n,
           CAST(e.err_n AS DOUBLE) / CAST(r.req_n AS DOUBLE)
               AS error_ratio,
           CAST(CASE WHEN CAST(e.err_n AS DOUBLE) / CAST(r.req_n AS DOUBLE)
                          > 0.5 THEN 1 ELSE 0 END AS BIGINT) AS breach
    FROM errors e JOIN requests r
      ON e.user_id = r.user_id AND e.day = r.day
    """,
)
def events_promql_binop_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL BINARY OPERATION with one-to-one vector matching — the
    everyday alerting construct ``errors_total / on(user_id)
    requests_total`` plus the comparison form ``... > bool 0.5``:
    two instant vectors (per-(user, day) error count and request
    count) match on their shared label set and divide; series present
    in only ONE operand are DROPPED (PromQL inner-match semantics —
    a user-day with zero errors emits no ratio at all, which is
    exactly why naive conditional aggregation is the wrong rewrite),
    and the ``bool`` modifier turns the comparison into a 0/1 sample
    instead of a filter. Public algorithm: prometheus/promql engine.go
    VectorBinop / VectorMatching (matching labels = the on() set,
    one-to-one cardinality). Exactness: both operands are BIGINT
    counts; the ratio is ONE IEEE division over identical integer
    operands (bit-equal in both engines) and the 0.5 breach compare
    reads that bit-identical double. Scale: two partial-agg rollups
    of one scan + an equi-join on the (user, day) series atom — the
    join is on pre-aggregated vectors (cardinality = active series,
    not raw samples), the shape Prometheus itself evaluates."""
    events = load_table(spark, sf_dir, "events")
    errors = (
        events.where(F.col("event_type") == "error")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("err_n"))
    )
    requests = events.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("req_n"))
    ratio = (
        F.col("err_n").cast("double") / F.col("req_n").cast("double")
    )
    return errors.join(requests, ["user_id", "day"]).select(
        "user_id",
        "day",
        "err_n",
        "req_n",
        ratio.alias("error_ratio"),
        F.when(ratio > 0.5, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("breach"),
    )


@register(
    "events_promql_binop_group_left",
    oracle="""
    WITH type_counts AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), user_info AS (
        SELECT DISTINCT user_id,
               CAST(user_id % 7 + 1 AS BIGINT) AS weight,
               'tier-' || CAST(user_id % 3 AS VARCHAR) AS tier
        FROM events
    )
    SELECT t.event_type, t.user_id, u.tier,
           t.n * u.weight AS weighted
    FROM type_counts t JOIN user_info u ON t.user_id = u.user_id
    """,
)
def events_promql_binop_group_left(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PromQL many-to-one vector matching with ``group_left`` — the
    info-metric enrichment idiom ``type_counts * on(user_id)
    group_left(tier) user_info``: many series on the left (one per
    (event_type, user)) match ONE right-side series per user, the
    arithmetic applies per match, and group_left copies the named
    extra label (``tier``) from the "one" side onto every result
    series — the standard way dashboards attach machine/tenant
    metadata to high-cardinality metrics. The one-side is derived
    from the distinct user atom (weight = user_id%7+1, tier =
    user_id%3), unique on the matching label by construction — the
    uniqueness PromQL enforces with its "many-to-one matching must be
    explicit" error. Public algorithm: prometheus/promql engine.go
    VectorMatching {Card: CardManyToOne, Include: [tier]}. Exactness:
    all-BIGINT products. Scale: the one-side is series-cardinality
    (distinct users) and BROADCAST to the many-side rollup — no
    shuffle of the big operand, the exact join strategy a 100 TB
    enrichment wants."""
    events = load_table(spark, sf_dir, "events")
    type_counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    user_info = (
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            (F.col("user_id") % 7 + 1).cast("bigint").alias("weight"),
            F.concat(
                F.lit("tier-"), (F.col("user_id") % 3).cast("string")
            ).alias("tier"),
        )
    )
    return type_counts.join(F.broadcast(user_info), "user_id").select(
        "event_type",
        "user_id",
        "tier",
        (F.col("n") * F.col("weight")).alias("weighted"),
    )


@register(
    "events_promql_setops",
    oracle="""
    WITH atom AS (
        SELECT event_type, user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
                   AS n_days
        FROM events GROUP BY 1, 2
    ), a AS (
        SELECT event_type, user_id, n FROM atom WHERE n >= 14
    ), b AS (
        SELECT event_type, user_id, n_days FROM atom WHERE n_days >= 12
    )
    SELECT 'and' AS op, a.event_type, a.user_id, a.n AS value
    FROM a SEMI JOIN b ON a.event_type = b.event_type
                      AND a.user_id = b.user_id
    UNION ALL
    SELECT 'unless' AS op, a.event_type, a.user_id, a.n AS value
    FROM a ANTI JOIN b ON a.event_type = b.event_type
                      AND a.user_id = b.user_id
    UNION ALL
    SELECT 'or' AS op, event_type, user_id, n AS value FROM a
    UNION ALL
    SELECT 'or' AS op, b.event_type, b.user_id, b.n_days AS value
    FROM b ANTI JOIN a ON b.event_type = a.event_type
                      AND b.user_id = a.user_id
    """,
)
def events_promql_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL SET OPERATIONS between instant vectors — ``A and B``
    (keep A's series whose label set also exists in B, with A's
    value), ``A unless B`` (A's series with no match in B), and
    ``A or B`` (all of A, plus B's series absent from A carrying B's
    value) — the constructs that compose alert conditions ("high
    volume AND sustained activity"). A = (type, user) series with
    total count >= 14; B = the same atom filtered to >= 12 distinct
    active days; both derive from one rollup so the label universe is
    shared. Public algorithm: prometheus/promql engine.go
    VectorAnd / VectorOr / VectorUnless (signature = matching-label
    hash; here the full label set). Exactness: values are BIGINT
    counts carried unchanged from the winning operand. Scale: one
    hash-agg atom feeds all three ops; and/unless/or are
    semi/anti-joins on series-cardinality vectors — never raw
    samples, and never a shuffle wider than the series atom."""
    events = load_table(spark, sf_dir, "events")
    # The series atom feeds a/b across four join branches and exchange
    # reuse does not fire across the union aliases — one eager
    # checkpoint runs the events-wide agg exactly once (the
    # dedup_minhash_lsh fan-out discipline); the materialized frame is
    # series-cardinality, never raw samples.
    atom = (
        events.groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(F.date_trunc("day", "ts"))
            .cast("bigint")
            .alias("n_days"),
        )
        .localCheckpoint()
    )
    a = atom.where(F.col("n") >= 14).select("event_type", "user_id", "n")
    b = atom.where(F.col("n_days") >= 12).select(
        "event_type", "user_id", "n_days"
    )
    keys = ["event_type", "user_id"]
    op_and = a.join(b, keys, "left_semi").select(
        F.lit("and").alias("op"), "event_type", "user_id",
        F.col("n").alias("value"),
    )
    op_unless = a.join(b, keys, "left_anti").select(
        F.lit("unless").alias("op"), "event_type", "user_id",
        F.col("n").alias("value"),
    )
    op_or = a.select(
        F.lit("or").alias("op"), "event_type", "user_id",
        F.col("n").alias("value"),
    ).unionAll(
        b.join(a, keys, "left_anti").select(
            F.lit("or").alias("op"), "event_type", "user_id",
            F.col("n_days").alias("value"),
        )
    )
    return op_and.unionAll(op_unless).unionAll(op_or)


@register(
    "events_alert_for_duration",
    oracle="""
    WITH hours AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events),
    idx AS (
        SELECT h, CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT) AS hidx
        FROM hours
    ),
    grid AS (
        SELECT t.event_type, i.hidx
        FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN idx i
    ),
    cnt AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    ci AS (SELECT c.event_type, i.hidx, c.n FROM cnt c JOIN idx i ON c.h = i.h),
    ev AS (
        SELECT g.event_type, g.hidx, COALESCE(c.n, 0) AS n
        FROM grid g LEFT JOIN ci c USING (event_type, hidx)
    ),
    tr AS (
        SELECT event_type, hidx,
               hidx - row_number() OVER (PARTITION BY event_type
                                         ORDER BY hidx) AS isl_key
        FROM ev WHERE n >= 4
    ),
    isl AS (
        SELECT event_type, isl_key, min(hidx) AS s, max(hidx) AS e,
               CAST(count(*) AS BIGINT) AS len
        FROM tr GROUP BY 1, 2
    ),
    w AS (
        SELECT *, max(e) OVER (PARTITION BY event_type ORDER BY s
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_e
        FROM isl
    ),
    f AS (
        SELECT *, CASE WHEN prev_e IS NULL OR s - prev_e > 2
                       THEN 1 ELSE 0 END AS new_c
        FROM w
    ),
    cl AS (
        SELECT *, sum(new_c) OVER (PARTITION BY event_type ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS cid
        FROM f
    )
    SELECT event_type, CAST(cid AS BIGINT) AS incident_id,
           min(s) AS cluster_start, max(e) AS cluster_end,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len) AS BIGINT) AS n_true,
           (min(CASE WHEN len >= 3 THEN s END) IS NOT NULL) AS fired,
           min(CASE WHEN len >= 3 THEN s END) + 2 AS fired_at,
           CASE WHEN min(CASE WHEN len >= 3 THEN s END) IS NOT NULL
                THEN max(e) + 3 END AS resolved_at
    FROM cl GROUP BY 1, 2
    """,
)
def events_alert_for_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus alert ``for:`` + ``keep_firing_for:`` duration
    semantics — the state machine behind every production alert rule:
    a breach condition (hourly samples >= 4 on the shared eval grid;
    missing hours evaluate FALSE, the dense-grid contract) must hold
    for THREE consecutive evaluations before the alert FIRES
    (``for: 3h`` — pending resets on any false step, so only
    per-island run length qualifies), and once firing it stays firing
    through gaps of up to TWO false evaluations (``keep_firing_for:
    2h`` — condition re-breaching inside the grace window continues
    the same incident rather than opening a new pending cycle).
    Built from two composed gap-and-island rewrites the engine already
    proves: consecutive-true islands (hidx - row_number), then the
    running-max-of-ends cluster merge from `analytic_merge_intervals`
    with a KEEP-sized gap tolerance. Per (rule series = event_type,
    incident cluster): bounds, island/true counts, whether any island
    reached the for-duration, the fire step (qualifying island start
    + for - 1) and the scheduled resolve step (last true + keep + 1).
    Public algorithm: prometheus/rules alerting.go Rule.Eval
    (StatePending -> StateFiring, keepFiringFor hold). Exactness: the
    whole pipeline is integer eval-step arithmetic on BIGINT. Scale:
    one hourly rollup + a series-cardinality grid join, then windows
    partitioned per series — state is series-count-sized, never
    sample-sized; at 100 TB this is the recording-rule shape (rollup
    once, evaluate on the rollup)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hours = events.select(F.date_trunc("hour", "ts").alias("h")).distinct()
    idx = hours.select(
        "h",
        (F.row_number().over(Window.orderBy("h")) - 1)
        .cast("bigint")
        .alias("hidx"),
    )
    types = events.select("event_type").distinct()
    grid = types.crossJoin(idx.select("hidx"))
    cnt = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ci = cnt.join(idx, "h").select("event_type", "hidx", "n")
    ev = grid.join(ci, ["event_type", "hidx"], "left").select(
        "event_type", "hidx", F.coalesce("n", F.lit(0)).alias("n")
    )
    wser = Window.partitionBy("event_type").orderBy("hidx")
    tr = ev.where(F.col("n") >= 4).select(
        "event_type",
        "hidx",
        (F.col("hidx") - F.row_number().over(wser)).alias("isl_key"),
    )
    isl = tr.groupBy("event_type", "isl_key").agg(
        F.min("hidx").alias("s"),
        F.max("hidx").alias("e"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
    )
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cl = (
        isl.withColumn("prev_e", F.max("e").over(wprev))
        .withColumn(
            "new_c",
            F.when(
                F.col("prev_e").isNull() | (F.col("s") - F.col("prev_e") > 2),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("cid", F.sum("new_c").over(wrun))
    )
    fire_s = F.min(F.when(F.col("len") >= 3, F.col("s")))
    return cl.groupBy(
        "event_type", F.col("cid").cast("bigint").alias("incident_id")
    ).agg(
        F.min("s").alias("cluster_start"),
        F.max("e").alias("cluster_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("len").cast("bigint").alias("n_true"),
        fire_s.isNotNull().alias("fired"),
        (fire_s + 2).alias("fired_at"),
        F.when(fire_s.isNotNull(), F.max("e") + 3).alias("resolved_at"),
    )


@register(
    "events_slo_burn_rate",
    oracle="""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS req,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
                   AS err
        FROM events GROUP BY 1, 2
    ), win AS (
        SELECT user_id, h, req AS req_1h, err AS err_1h,
               CAST(SUM(req) OVER w6 AS BIGINT) AS req_6h,
               CAST(SUM(err) OVER w6 AS BIGINT) AS err_6h,
               CAST(SUM(req) OVER w24 AS BIGINT) AS req_24h,
               CAST(SUM(err) OVER w24 AS BIGINT) AS err_24h
        FROM hourly
        WINDOW w6 AS (PARTITION BY user_id ORDER BY h
                      RANGE BETWEEN INTERVAL 5 HOUR PRECEDING
                      AND CURRENT ROW),
               w24 AS (PARTITION BY user_id ORDER BY h
                       RANGE BETWEEN INTERVAL 23 HOUR PRECEDING
                       AND CURRENT ROW)
    ), rates AS (
        SELECT *,
               100.0 * CAST(err_1h AS DOUBLE) / CAST(req_1h AS DOUBLE)
                   AS burn_1h,
               100.0 * CAST(err_6h AS DOUBLE) / CAST(req_6h AS DOUBLE)
                   AS burn_6h,
               100.0 * CAST(err_24h AS DOUBLE) / CAST(req_24h AS DOUBLE)
                   AS burn_24h
        FROM win
    )
    SELECT user_id, h,
           req_1h, err_1h, req_6h, err_6h, req_24h, err_24h,
           burn_1h, burn_6h, burn_24h,
           (burn_1h > 14.4 AND burn_6h > 6.0) AS page_fast_burn,
           (burn_6h > 6.0 AND burn_24h > 3.0) AS ticket_slow_burn
    FROM rates
    """,
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO ERROR-BUDGET BURN-RATE with multiwindow multi-burn-rate
    alerting — the SRE-workbook construct modern paging is built on
    (public algorithm: Google SRE Workbook ch. 5, "Multiwindow,
    Multi-Burn-Rate Alerts"): for a 99%-success SLO the burn rate is
    error_ratio / (1 - SLO) = 100 x err/req; a PAGE requires the fast
    pair to breach together (1 h > 14.4 AND 6 h > 6 — the long window
    filters blips, the short window keeps detection fast) and a TICKET
    the slow pair (6 h > 6 AND 24 h > 3). Windows are TIME-RANGE
    frames over the per-(user, hour) rollup (`RANGE BETWEEN INTERVAL
    ... PRECEDING` — missing hours contribute nothing, exactly the
    time-predicate semantics row frames get wrong; inclusive bounds
    probed identical cross-engine in round 9). Composes the engine's
    rate + vector-ratio + range-frame primitives into the everyday
    production alert. Exactness: BIGINT window sums; each burn rate is
    ONE IEEE expression over identical integer operands, and the
    threshold literals compare bit-identical doubles. Scale: one
    hourly rollup shuffle + two frames over one per-series ordered
    scan — state is series x window, never raw samples."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("req"),
        F.count_if(F.col("event_type") == "error").cast("bigint").alias("err"),
    )
    # RANGE INTERVAL '5'/'23' HOUR PRECEDING, spelled as epoch-second
    # range frames (hour timestamps are exact integer seconds, so the
    # bounds are identical) — pure DataFrame API, no session-global
    # temp view to collide across concurrent invocations (ADVICE r10).
    w6 = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("h"))
        .rangeBetween(-5 * 3600, 0)
    )
    w24 = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("h"))
        .rangeBetween(-23 * 3600, 0)
    )
    win = hourly.select(
        "user_id",
        "h",
        F.col("req").alias("req_1h"),
        F.col("err").alias("err_1h"),
        F.sum("req").over(w6).cast("bigint").alias("req_6h"),
        F.sum("err").over(w6).cast("bigint").alias("err_6h"),
        F.sum("req").over(w24).cast("bigint").alias("req_24h"),
        F.sum("err").over(w24).cast("bigint").alias("err_24h"),
    )

    def burn(err_c: str, req_c: str):
        return (
            F.lit(100.0)
            * F.col(err_c).cast("double")
            / F.col(req_c).cast("double")
        )

    rates = win.select(
        "*",
        burn("err_1h", "req_1h").alias("burn_1h"),
        burn("err_6h", "req_6h").alias("burn_6h"),
        burn("err_24h", "req_24h").alias("burn_24h"),
    )
    return rates.select(
        "*",
        ((F.col("burn_1h") > 14.4) & (F.col("burn_6h") > 6.0)).alias(
            "page_fast_burn"
        ),
        ((F.col("burn_6h") > 6.0) & (F.col("burn_24h") > 3.0)).alias(
            "ticket_slow_burn"
        ),
    )


@register(
    "events_promql_subquery",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), inner_eval AS (
        SELECT event_type, h,
               CAST(SUM(v) OVER w3 AS DOUBLE)
                 / CAST(COUNT(*) OVER w3 AS DOUBLE) AS avg3
        FROM hourly
        WINDOW w3 AS (PARTITION BY event_type ORDER BY h
                      RANGE BETWEEN INTERVAL 2 HOUR PRECEDING
                      AND CURRENT ROW)
    )
    SELECT event_type, date_trunc('day', h) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_evals,
           MAX(avg3) AS max_inner,
           MIN(avg3) AS min_inner,
           max_by(avg3, h) AS last_inner
    FROM inner_eval GROUP BY 1, 2
    """,
)
def events_promql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL SUBQUERY evaluation —
    ``max_over_time(avg_over_time(x[3h])[1d:1h])``: a range selector
    over a DERIVED series, the last uncovered core of PromQL after the
    r8–r10 rate/over_time/binop families. Semantics (public algorithm:
    prometheus/promql engine.go SubqueryExpr / evalSubquery): the inner
    expression is evaluated at every subquery step inside the outer
    range — materializing an intermediate series that never existed in
    the TSDB — and the outer range function then aggregates those
    synthetic samples per outer evaluation. Here the inner
    ``avg_over_time(x[3h])`` evaluates on the series' own hourly grid
    (step = the sample interval, the recording-rule materialization of
    the same composition; PromQL range selection (t-3h, t] over hourly
    samples = the 3-sample inclusive time-range frame, identical
    RANGE INTERVAL bounds both engines, probed round 9) and the outer
    ``max/min/last_over_time(...[1d:1h])`` aggregates the derived
    per-hour values per UTC day. Exactness: the inner average is ONE
    IEEE division over a DECIMAL window sum and a BIGINT count —
    bit-equal operands cross-engine — and every outer function is a
    SELECTION of those bit-identical doubles (max/min/last; no double
    re-summation anywhere). Scale: one hourly rollup + one per-series
    ordered window scan + one (type, day) hash agg — the derived
    series is rollup-sized, never event-sized, exactly how a recording
    rule keeps subqueries cheap on a 1000-executor cluster."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    # RANGE INTERVAL '2' HOUR PRECEDING, spelled as an epoch-second
    # range frame (hour timestamps are exact integer seconds, so the
    # bounds are identical) — keeps the plan in the DataFrame API with
    # no session-global temp view (the ADVICE-flagged hazard class).
    w3 = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("h"))
        .rangeBetween(-7200, 0)
    )
    inner = hourly.select(
        "event_type",
        "h",
        (
            F.sum("v").over(w3).cast("double")
            / F.count(F.lit(1)).over(w3).cast("double")
        ).alias("avg3"),
    )
    return inner.groupBy(
        "event_type", F.date_trunc("day", "h").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_evals"),
        F.max("avg3").alias("max_inner"),
        F.min("avg3").alias("min_inner"),
        F.max_by("avg3", "h").alias("last_inner"),
    )


@register(
    "events_promql_offset_at",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), anchor AS (
        SELECT event_type, CAST(max_by(v, h) AS DOUBLE) AS v_at_end
        FROM hourly GROUP BY 1
    )
    SELECT cur.event_type, cur.h,
           CAST(cur.v AS DOUBLE) AS v,
           CAST(prev.v AS DOUBLE) AS v_offset_1d,
           CAST(cur.v AS DOUBLE) / CAST(prev.v AS DOUBLE) AS dod_ratio,
           a.v_at_end,
           (CAST(cur.v AS DOUBLE) > a.v_at_end) AS above_end
    FROM hourly cur
    JOIN hourly prev
      ON prev.event_type = cur.event_type
     AND prev.h = cur.h - INTERVAL 24 HOUR
    JOIN anchor a ON a.event_type = cur.event_type
    """,
)
def events_promql_offset_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``offset`` and ``@`` MODIFIERS — the time-shift algebra
    behind every week-over-week/day-over-day alert: ``x / (x offset
    1d)`` pairs each sample with the sample exactly 24 h earlier (an
    event-TIME shift resolved by a timestamp equi-join, not a row
    lag — PromQL offset re-anchors the lookup instant, so irregular/
    missing hours must drop the pair, which the INNER join's
    vector-matching DROP semantics give for free, same contract as
    `events_promql_binop_ratio`), and ``x @ end()`` pins the inner
    evaluation to one fixed instant — the series' last sample —
    turning a moving series into a constant vector that every current
    sample compares against (the "how far are we from where we ended
    up" idiom). Public algorithm: prometheus/promql ast.go
    VectorSelector.Offset / StartOrEnd + engine.go timestamp
    re-anchoring. Exactness: samples are DECIMAL hourly sums; the
    shifted join key is integer-hour timestamp arithmetic; the ratio
    is ONE IEEE division over exact casts and the @-comparison is a
    selection + boolean over bit-identical doubles. Scale: one hourly
    rollup, one shuffle-free-shaped self-join on (series, shifted
    hour) over the rollup (co-partitioned on the same key), and a
    series-cardinality anchor dim broadcast onto it — never the raw
    table twice."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    anchor = hourly.groupBy("event_type").agg(
        F.max_by("v", "h").cast("double").alias("v_at_end")
    )
    prev = hourly.select(
        "event_type",
        (F.col("h") + F.expr("INTERVAL 24 HOUR")).alias("h"),
        F.col("v").alias("v_prev"),
    )
    cur_d = F.col("v").cast("double")
    prev_d = F.col("v_prev").cast("double")
    return (
        hourly.join(prev, ["event_type", "h"])
        .join(F.broadcast(anchor), "event_type")
        .select(
            "event_type",
            "h",
            cur_d.alias("v"),
            prev_d.alias("v_offset_1d"),
            (cur_d / prev_d).alias("dod_ratio"),
            "v_at_end",
            (cur_d > F.col("v_at_end")).alias("above_end"),
        )
    )


@register(
    "events_graphite_summarize",
    oracle="""
    WITH daily AS (
        SELECT 'stats.' || event_type || '.value' AS path,
               date_trunc('day', ts) AS day,
               SUM(CAST(value AS DECIMAL(27,4))) AS s
        FROM events GROUP BY 1, 2
    ), cur AS (
        SELECT path, max_by(s, day) AS current_v
        FROM daily GROUP BY 1
    ), ranked AS (
        SELECT path, current_v,
               row_number() OVER (ORDER BY current_v DESC, path) AS rnk
        FROM cur
    )
    SELECT split_part(d.path, '.', 2) AS alias,
           d.day,
           CAST(d.s AS DOUBLE) AS v_sum,
           CAST(r.current_v AS DOUBLE) AS current_v,
           CAST(r.rnk AS INT) AS rnk
    FROM daily d JOIN ranked r ON d.path = r.path
    WHERE r.rnk <= 3
    """,
)
def events_graphite_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite RENDER-API function composition —
    ``highestCurrent(aliasByNode(summarize(stats.*.value, "1day",
    "sum"), 1), 3)``: the query-side half of the carbon family (the
    engine already ingests/routes/aggregates the wire; these are the
    functions a graphite-web user calls on the stored series). Public
    algorithm: graphite-web render/functions.py — ``summarize``
    re-buckets each series into fixed intervals with the named
    aggregator (day buckets, sum); ``aliasByNode(1)`` renames each
    series to the dot-split node at index 1 (here the metric's type
    segment); ``highestCurrent(3)`` sorts series by their LAST
    non-null value and keeps the top 3. Exactness: summarize sums in
    DECIMAL; "current" is a max_by selection of those exact decimals;
    the top-3 ranking tie-breaks on the path string; every DOUBLE in
    the output is a straight cast of an exact decimal. Scale: one
    (path, day) hash agg, a series-cardinality current/rank dim
    (window over |series| rows, not samples) broadcast back onto the
    daily rollup — at 100 TB the render layer only ever touches
    rollup-sized frames."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.concat(
            F.lit("stats."), F.col("event_type"), F.lit(".value")
        ).alias("path"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("s"))
    cur = daily.groupBy("path").agg(F.max_by("s", "day").alias("current_v"))
    ranked = cur.select(
        "path",
        "current_v",
        F.row_number()
        .over(Window.orderBy(F.col("current_v").desc(), F.col("path")))
        .alias("rnk"),
    ).where(F.col("rnk") <= 3)
    return daily.join(F.broadcast(ranked), "path").select(
        F.split_part(F.col("path"), F.lit("."), F.lit(2)).alias("alias"),
        "day",
        F.col("s").cast("double").alias("v_sum"),
        F.col("current_v").cast("double").alias("current_v"),
        F.col("rnk").cast("int").alias("rnk"),
    )


@register(
    "events_graphite_moving",
    oracle="""
    WITH hourly AS (
        SELECT 'stats.' || event_type || '.value' AS path,
               date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT path, h, v,
               lag(v, 3) OVER w AS l1,
               lag(v, 2) OVER w AS l2,
               lag(v, 1) OVER w AS l3
        FROM hourly
        WINDOW w AS (PARTITION BY path ORDER BY h)
    )
    SELECT path, h, CAST(v AS DOUBLE) AS v,
           CAST(l1 + l2 + l3 AS DOUBLE) / 3.0 AS mov_avg_3,
           greatest(least(CAST(l1 AS DOUBLE), CAST(l2 AS DOUBLE)),
                    least(greatest(CAST(l1 AS DOUBLE), CAST(l2 AS DOUBLE)),
                          CAST(l3 AS DOUBLE))) AS mov_median_3,
           greatest(CAST(l1 AS DOUBLE), CAST(l2 AS DOUBLE),
                    CAST(l3 AS DOUBLE)) AS mov_max_3
    FROM lagged WHERE l1 IS NOT NULL
    """,
)
def events_graphite_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite RENDER-API moving-window family — ``movingAverage``,
    ``movingMedian``, ``movingMax`` with windowSize = 3 points over
    the per-series hourly rollup. Public algorithm: graphite-web
    render/functions.py movingAverage et al. — the window at point i
    is the PREVIOUS windowSize points EXCLUDING i itself (graphite
    pre-fetches windowSize extra points and emits nothing until the
    window fills, hence the l1-IS-NOT-NULL gate), spelled here as
    three explicit lags so both engines evaluate the identical
    expression tree. Exactness: the average is a DECIMAL 3-term sum
    cast to double with ONE IEEE division; the 3-point median is a
    pure min/max SELECTION network (no interpolation, no engine median
    semantics in play — sidesteps the DuckDB DECIMAL-median
    divergence); max is a selection. Scale: one hourly rollup + one
    per-series ordered window scan — lag frames never self-join, and
    the render layer stays rollup-sized."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.concat(
            F.lit("stats."), F.col("event_type"), F.lit(".value")
        ).alias("path"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    w = Window.partitionBy("path").orderBy("h")
    lagged = hourly.select(
        "path",
        "h",
        "v",
        F.lag("v", 3).over(w).alias("l1"),
        F.lag("v", 2).over(w).alias("l2"),
        F.lag("v", 1).over(w).alias("l3"),
    ).where(F.col("l1").isNotNull())
    d1 = F.col("l1").cast("double")
    d2 = F.col("l2").cast("double")
    d3 = F.col("l3").cast("double")
    return lagged.select(
        "path",
        "h",
        F.col("v").cast("double").alias("v"),
        (
            (F.col("l1") + F.col("l2") + F.col("l3")).cast("double")
            / F.lit(3.0)
        ).alias("mov_avg_3"),
        F.greatest(
            F.least(d1, d2), F.least(F.greatest(d1, d2), d3)
        ).alias("mov_median_3"),
        F.greatest(d1, d2, d3).alias("mov_max_3"),
    )


@register(
    "events_graphite_derivative",
    oracle="""
    WITH hourly AS (
        SELECT 'stats.' || event_type || '.value' AS path,
               date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT path, h, v,
               lag(v) OVER w AS v_prev,
               lag(h) OVER w AS h_prev,
               SUM(v) OVER (PARTITION BY path ORDER BY h
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM hourly
        WINDOW w AS (PARTITION BY path ORDER BY h)
    )
    SELECT path, h, CAST(v AS DOUBLE) AS v,
           CAST(v - v_prev AS DOUBLE) AS derivative,
           CAST(v - v_prev AS DOUBLE)
             / CAST(epoch(h) - epoch(h_prev) AS DOUBLE) AS per_second,
           CAST(cum AS DOUBLE) AS integral
    FROM lagged WHERE v_prev IS NOT NULL
    """,
)
def events_graphite_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite RENDER-API rate/accumulation family — ``derivative``
    (raw delta to the previous point, graphite's non-normalized form),
    ``perSecond`` (delta divided by the actual inter-point seconds —
    the counter-rate form dashboards use), and ``integral`` (running
    cumulative sum from series start). Public algorithm: graphite-web
    render/functions.py derivative / perSecond / integral; like
    graphite, the first point of derivative/perSecond is dropped (no
    predecessor — graphite emits None). Exactness: deltas and the
    running sum stay DECIMAL end to end (order-independent by
    construction: a window cumsum is a sequential fold); perSecond is
    ONE IEEE division of those exact casts by integer seconds. Scale:
    one hourly rollup + one per-series ordered window scan shared by
    all three functions."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.concat(
            F.lit("stats."), F.col("event_type"), F.lit(".value")
        ).alias("path"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    w = Window.partitionBy("path").orderBy("h")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagged = hourly.select(
        "path",
        "h",
        "v",
        F.lag("v").over(w).alias("v_prev"),
        F.lag("h").over(w).alias("h_prev"),
        F.sum("v").over(wcum).alias("cum"),
    ).where(F.col("v_prev").isNotNull())
    delta = (F.col("v") - F.col("v_prev")).cast("double")
    return lagged.select(
        "path",
        "h",
        F.col("v").cast("double").alias("v"),
        delta.alias("derivative"),
        (
            delta
            / (F.unix_timestamp("h") - F.unix_timestamp("h_prev")).cast(
                "double"
            )
        ).alias("per_second"),
        F.col("cum").cast("double").alias("integral"),
    )


@register(
    "events_promql_subquery_rate",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS inc
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, h, inc,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                    - 1 AS BIGINT) AS hidx
        FROM hourly
    ), ctr AS (
        SELECT event_type, h,
               SUM(inc) OVER (PARTITION BY event_type, hidx // 37
                              ORDER BY h) AS v
        FROM idx
    ), lagged AS (
        SELECT event_type, h, CAST(epoch(h) AS BIGINT) AS t, v,
               lag(v) OVER (PARTITION BY event_type ORDER BY h) AS v_prev
        FROM ctr
    ), terms AS (
        SELECT *, CASE WHEN v < v_prev THEN v_prev
                       ELSE CAST(0 AS DECIMAL(38,4)) END AS term
        FROM lagged
    ), win AS (
        SELECT event_type, h, t, v,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               min(t) OVER w AS t_first,
               min_by(v, t) OVER w AS v_first,
               SUM(term) OVER w AS corr_all,
               min_by(term, t) OVER w AS term_first
        FROM terms
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     RANGE BETWEEN INTERVAL 5 HOUR PRECEDING
                     AND CURRENT ROW)
    ), calc AS (
        SELECT event_type, h, n,
               CAST(v - v_first + corr_all - term_first AS DOUBLE) AS delta,
               CAST(t - t_first AS DOUBLE) AS sampled,
               CAST(t_first - (t - 21600) AS DOUBLE) AS dur_start0,
               CAST(v_first AS DOUBLE) AS vf
        FROM win WHERE n >= 2
    ), calc2 AS (
        SELECT *, sampled / (n - 1) AS avg_dur,
               CASE WHEN delta > 0 AND vf >= 0
                    THEN least(dur_start0, sampled * (vf / delta))
                    ELSE dur_start0 END AS dur_start
        FROM calc
    ), rates AS (
        SELECT event_type, h,
               delta * ((sampled
                    + CASE WHEN dur_start < avg_dur * 1.1
                           THEN dur_start ELSE avg_dur / 2 END)
                   / sampled) / 21600.0 AS r
        FROM calc2
    )
    SELECT event_type, date_trunc('day', h) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_evals,
           MAX(r) AS max_rate,
           MIN(r) AS min_rate,
           max_by(r, h) AS last_rate
    FROM rates GROUP BY 1, 2
    """,
)
def events_promql_subquery_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL subquery over a COUNTER function —
    ``max_over_time(rate(x[6h])[1d:1h])``, the canonical subquery
    idiom verbatim (a range function over rate's derived series; the
    r11 gauge subquery's heavyweight sibling). The inner
    ``rate(x[6h])`` runs the REAL extrapolatedRate at every hourly
    grid point via sliding time-range frames: per eval window,
    in-window reset correction (the reset term is precomputed per
    sample from the GLOBAL per-series lag, frame-summed, then the
    EARLIEST frame sample's term is subtracted — its predecessor
    always lies outside the window, the frame-vs-pair off-by-one that
    makes sliding-window counter rates subtle), extrapolation to the
    window edges with the zero-crossing cap, and the trailing edge
    contributing 0 because the eval grid IS the sample grid. Validated
    this round against an independent Python transcription of
    prometheus/promql functions.go extrapolatedRate (agreement to
    float-association noise; the ORACLE comparison is over the
    identical expression tree, hence bit-exact). Outer
    ``max/min/last_over_time(...[1d:1h])`` are pure selections of the
    bit-identical inner doubles per UTC day. Exactness: counter/terms/
    delta stay DECIMAL through every frame sum; timestamps are integer
    seconds; the extrapolation is one fixed IEEE chain. Scale: one
    hourly rollup + per-series ordered window scans (never a
    self-join) + one (type, day) hash agg — the recording-rule shape
    that keeps subqueries cheap at 100 TB."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("inc"))
    wo = Window.partitionBy("event_type").orderBy("h")
    idx = hourly.withColumn(
        "hidx", (F.row_number().over(wo) - 1).cast("bigint")
    ).withColumn("seg", F.expr("hidx div 37"))
    wseg = (
        Window.partitionBy("event_type", "seg")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = idx.select(
        "event_type", "h", F.sum("inc").over(wseg).alias("v")
    )
    lagged = ctr.select(
        "event_type",
        "h",
        F.unix_timestamp("h").alias("t"),
        "v",
        F.lag("v").over(wo).alias("v_prev"),
    )
    terms = lagged.withColumn(
        "term",
        F.when(F.col("v") < F.col("v_prev"), F.col("v_prev")).otherwise(
            F.lit(0).cast("decimal(38,4)")
        ),
    )
    # RANGE INTERVAL '5' HOUR PRECEDING as an epoch-second range frame
    # (view-free discipline; integer-second hour stamps => identical
    # inclusive bounds) — the window is PromQL's (t-6h, t] on the
    # hourly sample grid.
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("h"))
        .rangeBetween(-5 * 3600, 0)
    )
    win = terms.select(
        "event_type",
        "h",
        "t",
        "v",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.min("t").over(w).alias("t_first"),
        F.min_by("v", "t").over(w).alias("v_first"),
        F.sum("term").over(w).alias("corr_all"),
        F.min_by("term", "t").over(w).alias("term_first"),
    )
    calc = win.where(F.col("n") >= 2).select(
        "event_type",
        "h",
        "n",
        (
            F.col("v")
            - F.col("v_first")
            + F.col("corr_all")
            - F.col("term_first")
        )
        .cast("double")
        .alias("delta"),
        (F.col("t") - F.col("t_first")).cast("double").alias("sampled"),
        (F.col("t_first") - (F.col("t") - 21600))
        .cast("double")
        .alias("dur_start0"),
        F.col("v_first").cast("double").alias("vf"),
    )
    calc2 = calc.withColumn(
        "avg_dur", F.col("sampled") / (F.col("n") - 1)
    ).withColumn(
        "dur_start",
        F.when(
            (F.col("delta") > 0) & (F.col("vf") >= 0),
            F.least(
                F.col("dur_start0"),
                F.col("sampled") * (F.col("vf") / F.col("delta")),
            ),
        ).otherwise(F.col("dur_start0")),
    )
    rates = calc2.select(
        "event_type",
        "h",
        (
            F.col("delta")
            * (
                (
                    F.col("sampled")
                    + F.when(
                        F.col("dur_start") < F.col("avg_dur") * 1.1,
                        F.col("dur_start"),
                    ).otherwise(F.col("avg_dur") / 2)
                )
                / F.col("sampled")
            )
            / F.lit(21600.0)
        ).alias("r"),
    )
    return rates.groupBy(
        "event_type", F.date_trunc("day", "h").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_evals"),
        F.max("r").alias("max_rate"),
        F.min("r").alias("min_rate"),
        F.max_by("r", "h").alias("last_rate"),
    )


@register(
    "events_native_histogram_quantile",
    oracle="""
    WITH pts AS (
        SELECT event_type, date_trunc('week', ts) AS week,
               CAST(CAST(value AS DECIMAL(27,4)) * 10000 AS BIGINT) AS v
        FROM events
    ), buck AS (
        SELECT event_type, week,
               CASE WHEN v = 1 THEN 0
                    ELSE CAST(length(bin(v - 1)) AS BIGINT) END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pts WHERE v > 0 GROUP BY 1, 2, 3
    ), cum AS (
        SELECT event_type, week, bucket, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY event_type, week
                                   ORDER BY bucket) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY event_type, week)
                    AS BIGINT) AS total
        FROM buck
    ), bounds AS (
        SELECT *,
               CASE WHEN bucket = 0 THEN 0.5
                    ELSE CAST((CAST(1 AS BIGINT) << (bucket - 1)) AS DOUBLE)
               END AS lo,
               CAST((CAST(1 AS BIGINT) << bucket) AS DOUBLE) AS hi
        FROM cum
    ), phis AS (
        -- DOUBLE phis: DuckDB would type the bare literals DECIMAL(3,2)
        -- and compute phi*total EXACTLY in decimal, a 1-ulp divergence
        -- from Spark's IEEE double product (found by exact-repr replay)
        SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS phi
    ), hit AS (
        SELECT b.event_type, b.week, p.phi, b.total,
               b.bucket, b.cnt, b.cum, b.lo, b.hi
        FROM bounds b CROSS JOIN phis p
        WHERE CAST(b.cum AS DOUBLE) >= p.phi * b.total
    )
    SELECT event_type, week, phi,
           CAST(max(total) AS BIGINT) AS n_events,
           min(bucket) AS sel_bucket,
           min_by((lo + (hi - lo) * (phi * total - (cum - cnt)) / cnt)
                  / 10000.0, bucket) AS q
    FROM hit GROUP BY 1, 2, 3
    """,
)
def events_native_histogram_quantile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``histogram_quantile`` over NATIVE (exponential) histograms —
    the query-side consumer of the schema-0 buckets the remote-write
    2.0 wire leg ships (`ingest_remote_write_v2_histograms`):
    prometheus's native-histogram quantile locates the bucket where
    the cumulative count crosses phi*N and interpolates LINEARLY
    within that bucket's exact bounds (2^(i-1), 2^i] — unlike the
    classic fixed-width `events_histogram_quantile`, the bounds come
    from the value itself, no configuration. Public algorithm:
    prometheus/promql quantile.go histogramQuantile (native branch).
    Exactness: bucket indices/counts/cumulatives are all integers
    (the bit-length ceil indexing on x10^4-scaled decimals), the
    rank phi*N is one IEEE product of exact operands, bucket bounds
    are integer shifts cast to double (bucket 0's lower bound is the
    exact dyadic 0.5), and the interpolation is ONE fixed IEEE chain —
    bit-equal cross-engine, selection tie-broken on the bucket index.
    Scale: one hash agg + two bucket-ordered windows per ~20-row
    (type, week) group + a 3-row phi grid — rollup-sized end to end."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.date_trunc("week", "ts").alias("week"),
        (F.col("value").cast("decimal(27,4)") * 10000)
        .cast("bigint")
        .alias("v"),
    ).where(F.col("v") > 0)
    bucket = F.when(F.col("v") == 1, F.lit(0).cast("bigint")).otherwise(
        F.length(F.bin(F.col("v") - 1)).cast("bigint")
    )
    buck = pts.groupBy(
        "event_type", "week", bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wcum = Window.partitionBy("event_type", "week").orderBy("bucket")
    wall = Window.partitionBy("event_type", "week")
    bounds = buck.select(
        "event_type",
        "week",
        "bucket",
        "cnt",
        F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        F.sum("cnt").over(wall).cast("bigint").alias("total"),
        F.when(F.col("bucket") == 0, F.lit(0.5))
        .otherwise(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT),"
                " CAST(bucket - 1 AS INT)) AS DOUBLE)"
            )
        )
        .alias("lo"),
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"
            " AS DOUBLE)"
        ).alias("hi"),
    )
    phis = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("phi")
    )
    hit = bounds.crossJoin(F.broadcast(phis)).where(
        F.col("cum").cast("double") >= F.col("phi") * F.col("total")
    )
    q_expr = (
        F.col("lo")
        + (F.col("hi") - F.col("lo"))
        * (F.col("phi") * F.col("total") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    ) / 10000.0
    return hit.groupBy("event_type", "week", "phi").agg(
        F.max("total").cast("bigint").alias("n_events"),
        F.min("bucket").alias("sel_bucket"),
        F.min_by(q_expr, F.col("bucket")).alias("q"),
    )


@register(
    "events_promql_count_values",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), dist AS (
        SELECT y AS sample_value,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_series
        FROM hourly GROUP BY 1
    )
    SELECT sample_value, n_occurrences, n_series,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC,
                                   sample_value) AS BIGINT) AS rnk
    FROM dist
    QUALIFY rnk <= 20
    """,
)
def events_promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``topk(20, count_values("v", x))`` — the value-
    distribution aggregator: count_values groups the instant vector BY
    SAMPLE VALUE (the inverse of a normal agg — the value becomes the
    label), the idiom for "how many targets report build_info version
    N" / payload-size mode detection. Public algorithm:
    prometheus/promql engine.go aggregation, parser.CountValues.
    Evaluated over the hourly sample-count series so every grouped
    value is an exact BIGINT (count_values on IEEE doubles groups by
    bit pattern — both engines agree trivially on integers, and the
    divergence suite needs no float-key pin). topk orders by
    occurrence count with the deterministic value tiebreak. Scale: one
    hourly rollup + one hash agg on the VALUE — output cardinality is
    the number of DISTINCT values (bounded, the point of the
    function), and the top-20 rank runs over that bounded frame, never
    the samples."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    dist = hourly.groupBy(F.col("y").alias("sample_value")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("event_type").cast("bigint").alias("n_series"),
    )
    return (
        dist.select(
            "sample_value",
            "n_occurrences",
            "n_series",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("n_occurrences").desc(), F.col("sample_value")
                )
            )
            .cast("bigint")
            .alias("rnk"),
        )
        .where(F.col("rnk") <= 20)
    )


@register(
    "events_graphite_aspercent",
    oracle="""
    WITH hourly AS (
        SELECT 'stats.' || event_type || '.value' AS path,
               date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT h, SUM(v) AS total FROM hourly GROUP BY 1
    )
    SELECT s.path, s.h,
           CAST(s.v AS DOUBLE) AS v,
           CAST(t.total AS DOUBLE) AS total,
           (CAST(s.v AS DOUBLE) / CAST(t.total AS DOUBLE)) * 100.0
               AS pct
    FROM hourly s JOIN tot t ON t.h = s.h
    """,
)
def events_graphite_aspercent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite RENDER-API ``asPercent(stats.*.value,
    sumSeries(stats.*.value))`` — each series as a share of the
    instant-wise total, the composition dashboards use for stacked
    100% charts. Public algorithm: graphite-web render/functions.py
    asPercent / sumSeries — the denominator series is the point-wise
    sum across the wildcard, aligned by timestamp. Exactness: both
    numerator and denominator are DECIMAL hourly sums (the total is a
    sum of exact decimals, itself exact); the share is one IEEE
    division then one multiply by the exact constant 100.0, spelled
    identically on both engines. Scale: one hourly rollup, an
    instant-keyed total (|hours| rows — broadcast back onto the
    rollup), never the raw table twice; at 100 TB the render layer
    only ever touches rollup-sized frames."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.concat(
            F.lit("stats."), F.col("event_type"), F.lit(".value")
        ).alias("path"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    tot = hourly.groupBy("h").agg(F.sum("v").alias("total"))
    v_d = F.col("v").cast("double")
    t_d = F.col("total").cast("double")
    return hourly.join(F.broadcast(tot), "h").select(
        "path",
        "h",
        v_d.alias("v"),
        t_d.alias("total"),
        ((v_d / t_d) * F.lit(100.0)).alias("pct"),
    )


@register(
    "events_promql_holt_winters",
    oracle="""
    WITH RECURSIVE hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), numbered AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY h) AS BIGINT) AS i
        FROM hourly
    ), hw AS (
        SELECT a.event_type, CAST(1 AS BIGINT) AS i,
               CAST(a.y AS DOUBLE) AS s,
               CAST(b2.y AS DOUBLE) - CAST(a.y AS DOUBLE) AS b
        FROM numbered a JOIN numbered b2
          ON b2.event_type = a.event_type AND a.i = 1 AND b2.i = 2
        UNION ALL
        SELECT r.event_type, r.i + 1,
               0.5e0 * CAST(n.y AS DOUBLE) + 0.5e0 * (r.s + r.b),
               0.25e0 * ((0.5e0 * CAST(n.y AS DOUBLE)
                          + 0.5e0 * (r.s + r.b)) - r.s)
                 + 0.75e0 * r.b
        FROM hw r JOIN numbered n
          ON n.event_type = r.event_type AND n.i = r.i + 1
    ), final AS (
        SELECT event_type,
               max(i) AS n_samples,
               max_by(s, i) AS level_end,
               max_by(b, i) AS trend_end
        FROM hw GROUP BY 1
    )
    SELECT event_type, n_samples, level_end, trend_end,
           level_end + trend_end AS forecast_next
    FROM final
    """,
)
def events_promql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``holt_winters(x[30d], 0.5, 0.25)`` (renamed
    ``double_exponential_smoothing`` in Prometheus 3.x) — Holt's
    linear method: a level/trend recurrence over the per-series sample
    stream, the trend-aware smoother behind capacity forecasting.
    Public algorithm: prometheus/promql functions.go funcHoltWinters —
    s_i = sf·y_i + (1−sf)·(s_{i−1}+b_{i−1}),
    b_i = tf·(s_i−s_{i−1}) + (1−tf)·b_{i−1}, initialized s₁=y₁,
    b₁=y₂−y₁. THE genuinely sequential operator in the PromQL surface
    (each state depends on the last — no window spelling exists), so
    the Spark side is an applyInPandas fold per series and the oracle
    is a DuckDB RECURSIVE CTE stepping i→i+1 — two independent
    engines walking the same recurrence. Relationship to the existing
    smoothers (deliberate, not duplication): `events_holt_trend` runs
    the same Holt recurrence PER (type, day) WINDOW through the
    JVM-aggregate-HOF ↔ DuckDB-list_reduce mechanism pair, and
    `events_holt_winters` is the SEASONAL triple form; this query is
    the PromQL whole-range form and pins a THIRD independent
    mechanism pair — grouped-map Pandas fold ↔ recursive CTE — the
    exact seam `stream_alert_for_duration` carries state through, so
    the streamed-state machinery has a batch-exact reference. Exactness: y is the hourly
    BIGINT sample count (exact as double); sf=0.5, tf=0.25 and their
    complements are exact binary fractions; both engines evaluate the
    identical IEEE expression tree per step, so 720 chained steps stay
    bit-equal (verified exact at sf0.01, not just 12-digit-canon).
    Scale: the fold state is O(1) per series and samples stream
    through Arrow batches grouped by series — the shuffle is one
    hash-partition of the ROLLUP by series key; 10M series × anything
    parallelizes across executors, exactly how the streamed alert
    twin's state machine shards."""
    import pandas as pd

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(spark)
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        ys = [float(v) for v in pdf["y"]]
        if len(ys) < 2:
            # PromQL returns no sample for a 1-point series
            return pd.DataFrame(
                columns=[
                    "event_type", "n_samples",
                    "level_end", "trend_end", "forecast_next",
                ]
            )
        s = ys[0]
        b = ys[1] - ys[0]
        for y in ys[1:]:
            s_new = 0.5 * y + 0.5 * (s + b)
            b = 0.25 * (s_new - s) + 0.75 * b
            s = s_new
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_samples": [len(ys)],
                "level_end": [s],
                "trend_end": [b],
                "forecast_next": [s + b],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, n_samples bigint,"
        " level_end double, trend_end double, forecast_next double",
    )


@register(
    "events_promql_quantile_agg",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT h, v,
               CAST(row_number() OVER (PARTITION BY h
                                       ORDER BY v, event_type) - 1
                    AS BIGINT) AS idx,
               CAST(count(*) OVER (PARTITION BY h) AS BIGINT) AS n
        FROM hourly
    ), sel AS (
        SELECT h, n,
            max(CASE WHEN idx = CAST(floor(0.5e0 * (n - 1)) AS BIGINT)
                     THEN CAST(v AS DOUBLE) END) AS lo50,
            max(CASE WHEN idx = CAST(floor(0.5e0 * (n - 1)) AS BIGINT) + 1
                     THEN CAST(v AS DOUBLE) END) AS hi50,
            max(CASE WHEN idx = CAST(floor(0.9e0 * (n - 1)) AS BIGINT)
                     THEN CAST(v AS DOUBLE) END) AS lo90,
            max(CASE WHEN idx = CAST(floor(0.9e0 * (n - 1)) AS BIGINT) + 1
                     THEN CAST(v AS DOUBLE) END) AS hi90
        FROM ranked GROUP BY h, n
    )
    SELECT h, n,
           lo50 + (coalesce(hi50, lo50) - lo50)
               * (0.5e0 * (n - 1) - floor(0.5e0 * (n - 1))) AS q50,
           lo90 + (coalesce(hi90, lo90) - lo90)
               * (0.9e0 * (n - 1) - floor(0.9e0 * (n - 1))) AS q90
    FROM sel
    """,
)
def events_promql_quantile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``quantile(φ, x)`` AGGREGATION operator — the φ-quantile
    ACROSS the instant vector (across series at one timestamp), the
    missing sibling of the r8 `quantile_over_time` (which runs over
    TIME per series). Public algorithm: prometheus/promql quantile.go
    `quantile` — sort the values, rank = φ·(n−1), linearly interpolate
    between the adjacent ranked values. Spelled rank-exactly: a
    per-instant row_number over the DECIMAL rollup (value order with
    series tiebreak), the lower/upper neighbors selected by
    conditional aggregation on the integer index, then ONE identical
    interpolation chain per φ on both engines (the hi neighbor
    coalesces to lo when the rank lands on the top index). Evaluated
    for φ=0.5 and φ=0.9 per hour. Scale: one hourly rollup + one
    per-instant window over |series| rows + one hash agg — never the
    raw table, no join; at 10M series the window is the shuffle and
    the quantile state is two selected rows per (instant, φ)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(27,4)")).alias("v"))
    w = Window.partitionBy("h").orderBy("v", "event_type")
    ranked = hourly.select(
        "h",
        "v",
        (F.row_number().over(w) - 1).cast("bigint").alias("idx"),
        F.count(F.lit(1))
        .over(Window.partitionBy("h"))
        .cast("bigint")
        .alias("n"),
    )

    def pick(phi: float, which: str):
        rank = F.lit(phi) * (F.col("n") - 1)
        lo_idx = F.floor(rank).cast("bigint")
        tgt = lo_idx if which == "lo" else lo_idx + 1
        return F.max(
            F.when(F.col("idx") == tgt, F.col("v").cast("double"))
        )

    sel = ranked.groupBy("h", "n").agg(
        pick(0.5, "lo").alias("lo50"),
        pick(0.5, "hi").alias("hi50"),
        pick(0.9, "lo").alias("lo90"),
        pick(0.9, "hi").alias("hi90"),
    )

    def interp(phi: float, lo: str, hi: str):
        rank = F.lit(phi) * (F.col("n") - 1)
        frac = rank - F.floor(rank)
        return F.col(lo) + (
            F.coalesce(F.col(hi), F.col(lo)) - F.col(lo)
        ) * frac

    return sel.select(
        "h",
        "n",
        interp(0.5, "lo50", "hi50").alias("q50"),
        interp(0.9, "lo90", "hi90").alias("q90"),
    )


@register(
    "events_spc_western_electric",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM hourly GROUP BY 1
    ), scored AS (
        SELECT hh.event_type, hh.h, hh.y,
               CAST(s.sy AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean,
               sqrt(CAST(s.n * s.syy - s.sy * s.sy AS DOUBLE))
                   / CAST(s.n AS DOUBLE) AS sd
        FROM hourly hh JOIN stats s ON s.event_type = hh.event_type
    ), sided AS (
        SELECT event_type, h, y, mean, sd,
               CASE WHEN CAST(y AS DOUBLE) > mean THEN 1
                    WHEN CAST(y AS DOUBLE) < mean THEN -1 ELSE 0
               END AS side,
               CASE WHEN abs(CAST(y AS DOUBLE) - mean) > 3.0e0 * sd
                    THEN 1 ELSE 0 END AS beyond3,
               CASE WHEN CAST(y AS DOUBLE) - mean > 2.0e0 * sd
                    THEN 1 ELSE 0 END AS above2,
               CASE WHEN mean - CAST(y AS DOUBLE) > 2.0e0 * sd
                    THEN 1 ELSE 0 END AS below2,
               CASE WHEN CAST(y AS DOUBLE) - mean > 1.0e0 * sd
                    THEN 1 ELSE 0 END AS above1,
               CASE WHEN mean - CAST(y AS DOUBLE) > 1.0e0 * sd
                    THEN 1 ELSE 0 END AS below1
        FROM scored
    ), ruled AS (
        SELECT event_type, h, y, side, beyond3,
               SUM(above2) OVER w3 AS n_above2_3,
               SUM(below2) OVER w3 AS n_below2_3,
               SUM(above1) OVER w5 AS n_above1_5,
               SUM(below1) OVER w5 AS n_below1_5,
               SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) OVER w8
                   AS n_up_8,
               SUM(CASE WHEN side = -1 THEN 1 ELSE 0 END) OVER w8
                   AS n_down_8,
               CAST(COUNT(*) OVER w8 AS BIGINT) AS n_in_w8
        FROM sided
        WINDOW w3 AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               w5 AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
               w8 AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, h, y,
           (beyond3 = 1) AS rule1,
           (n_above2_3 >= 2 OR n_below2_3 >= 2) AS rule2,
           (n_above1_5 >= 4 OR n_below1_5 >= 4) AS rule3,
           (n_in_w8 = 8 AND (n_up_8 = 8 OR n_down_8 = 8)) AS rule4
    FROM ruled
    WHERE beyond3 = 1 OR n_above2_3 >= 2 OR n_below2_3 >= 2
       OR n_above1_5 >= 4 OR n_below1_5 >= 4
       OR (n_in_w8 = 8 AND (n_up_8 = 8 OR n_down_8 = 8))
    """,
)
def events_spc_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATISTICAL PROCESS CONTROL — the WESTERN ELECTRIC rules
    (WECO handbook 1956; the Shewhart-chart alarm set every SRE
    anomaly detector descends from), evaluated per series over the
    hourly sample-count chart: rule 1 = a point beyond 3σ; rule 2 =
    ≥2 of the last 3 beyond 2σ on the SAME side; rule 3 = ≥4 of the
    last 5 beyond 1σ same side; rule 4 = 8 consecutive points on one
    side of the center line. Complements the existing robust family
    (`events_anomaly_mad`, `events_cusum_score`, `events_changepoint`)
    with the classic zone-test semantics. Exactness: the center line
    and σ come from ALL-INTEGER sums (mean = Σy/n one division; σ =
    sqrt(nΣy²−(Σy)²)/n — sqrt is correctly-rounded IEEE in both
    engines over an exact integer radicand); every zone test compares
    identical double chains, and the rule windows are pure integer
    rolling sums over those booleans. Output: only the alarming
    points, with all four rule verdicts. Scale: one hourly rollup,
    a series-sized stats dim broadcast back, three ROWS-frame windows
    over one per-series ordered scan — chart evaluation at 10M series
    is embarrassingly parallel."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    mean = F.col("sy").cast("double") / F.col("n").cast("double")
    sd = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    ) / F.col("n").cast("double")
    y_d = F.col("y").cast("double")
    scored = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "h",
        "y",
        mean.alias("mean"),
        sd.alias("sd"),
    )
    sided = scored.select(
        "event_type",
        "h",
        "y",
        F.when(y_d > F.col("mean"), 1)
        .when(y_d < F.col("mean"), -1)
        .otherwise(0)
        .alias("side"),
        F.when(F.abs(y_d - F.col("mean")) > 3.0 * F.col("sd"), 1)
        .otherwise(0)
        .alias("beyond3"),
        F.when(y_d - F.col("mean") > 2.0 * F.col("sd"), 1)
        .otherwise(0)
        .alias("above2"),
        F.when(F.col("mean") - y_d > 2.0 * F.col("sd"), 1)
        .otherwise(0)
        .alias("below2"),
        F.when(y_d - F.col("mean") > 1.0 * F.col("sd"), 1)
        .otherwise(0)
        .alias("above1"),
        F.when(F.col("mean") - y_d > 1.0 * F.col("sd"), 1)
        .otherwise(0)
        .alias("below1"),
    )
    w3 = Window.partitionBy("event_type").orderBy("h").rowsBetween(-2, 0)
    w5 = Window.partitionBy("event_type").orderBy("h").rowsBetween(-4, 0)
    w8 = Window.partitionBy("event_type").orderBy("h").rowsBetween(-7, 0)
    ruled = sided.select(
        "event_type",
        "h",
        "y",
        "beyond3",
        F.sum("above2").over(w3).alias("n_above2_3"),
        F.sum("below2").over(w3).alias("n_below2_3"),
        F.sum("above1").over(w5).alias("n_above1_5"),
        F.sum("below1").over(w5).alias("n_below1_5"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .over(w8)
        .alias("n_up_8"),
        F.sum(F.when(F.col("side") == -1, 1).otherwise(0))
        .over(w8)
        .alias("n_down_8"),
        F.count(F.lit(1)).over(w8).cast("bigint").alias("n_in_w8"),
    )
    rule1 = F.col("beyond3") == 1
    rule2 = (F.col("n_above2_3") >= 2) | (F.col("n_below2_3") >= 2)
    rule3 = (F.col("n_above1_5") >= 4) | (F.col("n_below1_5") >= 4)
    rule4 = (F.col("n_in_w8") == 8) & (
        (F.col("n_up_8") == 8) | (F.col("n_down_8") == 8)
    )
    return ruled.where(rule1 | rule2 | rule3 | rule4).select(
        "event_type",
        "h",
        "y",
        rule1.alias("rule1"),
        rule2.alias("rule2"),
        rule3.alias("rule3"),
        rule4.alias("rule4"),
    )
