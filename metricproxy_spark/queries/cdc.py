"""CDC / merge-upsert queries (engine extension, SURVEY §3.8).

``events`` is treated as a keyed change stream: key = user_id, version
order = (ts, event_id), tombstone = event_type 'error'. The Spark path
exercises the real two-step MERGE (snapshot-at-cutoff + later changes
applied via :func:`merge_upsert`); the oracle collapses the whole
stream in one window — algebraically identical final state, so the
hash match proves the merge operator's upsert/delete semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.operators.cdc import latest_snapshot, merge_upsert
from metricproxy_spark.registry import register

_CUTOFF = "2024-01-15 00:00:00"


@register(
    "cdc_upsert_snapshot",
    oracle=f"""
    WITH last AS (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           value AS last_value
    FROM last WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics end-to-end: build the snapshot as of 2024-01-15
    (last writer per user, deletes applied), then MERGE the post-cutoff
    changes onto it — changes beat base, later (ts, event_id) beats
    earlier, a winning 'error' tombstone removes the user. One window
    per step, one shuffle on the merge key, no join. The single-pass
    oracle over the full stream yields the same final state iff the
    merge priority/tombstone algebra is right."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    tombstone = F.col("event_type") == "error"
    base = latest_snapshot(
        ev.filter(F.col("ts") < cutoff),
        keys=["user_id"],
        seq_cols=["ts", "event_id"],
        delete_predicate=tombstone,
    )
    changes = ev.filter(F.col("ts") >= cutoff)
    merged = merge_upsert(
        base,
        changes,
        keys=["user_id"],
        seq_cols=["ts", "event_id"],
        delete_predicate=tombstone,
    )
    return merged.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@register(
    "cdc_incremental_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) / count(*) AS avg_price
    FROM orders
    GROUP BY 1
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a materialized per-priority
    revenue rollup kept current by MERGING delta partials into a base
    snapshot instead of recomputing over the full table.

    Base = orders before the cutoff, aggregated once (the "nightly
    snapshot"); delta = orders after it, aggregated alone (tiny); the
    refresh is a union of the two partial-aggregate tables and a
    re-aggregation over |keys| rows — cost proportional to the DELTA,
    not the 100 TB base, because count and decimal-sum are commutative
    monoids and avg is derived sum/count at the end (never averaged
    across partials). The oracle aggregates the whole table in one
    pass: equality proves the merge algebra, which is what makes
    incremental refresh safe to run forever.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-06-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias(
                "sum_dec"
            ),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec")
        )
    )
    return merged.select(
        "o_orderpriority",
        "n",
        F.col("sum_dec").cast("double").alias("total"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("avg_price"),
    )


@register(
    "cdc_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_type, value,
               row_number() OVER w AS version,
               lead(ts) OVER w AS valid_to
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, version, ts AS valid_from, valid_to,
           event_type, value,
           CAST(valid_to IS NULL AS INT) AS is_current
    FROM ordered
    WHERE event_type <> 'error'
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build (the warehouse pattern MERGE feeds):
    every change becomes a versioned row with a [valid_from, valid_to)
    interval — lead(ts) over the per-key change order closes each
    interval, the last row per key stays open (is_current). Tombstones
    ('error') contribute their timestamp to close the prior version but
    emit no history row — i.e. a delete ends the interval without a
    successor.

    One window shuffle on the natural key, no join, no driver state;
    at 100 TB this is the standard "dimension history from a change
    stream" build, partitioned by key."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = ev.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        "event_type",
        "value",
    ).withColumn(
        "is_current", F.col("valid_to").isNull().cast("int")
    )
    return hist.where(F.col("event_type") != "error")


@register(
    "cdc_scd2_asof_enrich",
    oracle="""
    WITH dims AS (
        SELECT user_id, ts,
               arg_max(event_type, event_id) AS dim_type,
               arg_max(value, event_id) AS dim_value
        FROM events WHERE event_id % 4 = 0
        GROUP BY user_id, ts
    ), facts AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_id % 4 <> 0
    )
    SELECT f.event_id, f.user_id,
           epoch_us(f.ts) AS ts_us,
           f.value,
           d.dim_type, d.dim_value
    FROM facts f
    ASOF LEFT JOIN dims d
      ON f.user_id = d.user_id AND f.ts >= d.ts
    """,
)
def cdc_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-as-of-event-time enrichment — the composition a CDC
    warehouse runs constantly: attribute-change events (every 4th
    event) form a slowly-changing dimension, and every fact row picks
    up the dimension version IN EFFECT AT ITS TIMESTAMP. Implemented
    with the engine's JOIN-FREE as-of operator (union + one
    (user, ts)-sorted window with a forward-filled payload struct —
    no pair explosion, the shape that survives fact-sized inputs);
    the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so the engine's
    rewrite is value-checked against an independent first-class
    implementation of the same semantics. Dimension rows sharing
    (user, ts) pre-aggregate deterministically by max event_id (the
    documented as-of tie rule on both sides)."""
    from metricproxy_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    dims = (
        ev.where(F.col("event_id") % 4 == 0)
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_type", "event_id").alias("dim_type"),
            F.max_by("value", "event_id").alias("dim_value"),
        )
    )
    facts = ev.where(F.col("event_id") % 4 != 0).select(
        "event_id", "user_id", "ts", "value"
    )
    enriched = asof_join(
        facts,
        dims,
        on="user_id",
        ts_col="ts",
        right_payload=["dim_type", "dim_value"],
    )
    return enriched.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.col("dim_type_asof").alias("dim_type"),
        F.col("dim_value_asof").alias("dim_value"),
    )


@register(
    "cdc_delta_log_snapshot",
    oracle="""
    SELECT event_id, event_type, user_id, value
    FROM events WHERE event_type <> 'error'
    """,
)
def cdc_delta_log_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-protocol TRANSACTION-LOG snapshot reconstruction — the
    lakehouse mechanism under every ACID table (public spec:
    delta-io/delta PROTOCOL.md — a ``_delta_log/`` of ordered JSON
    commit files whose ``add``/``remove`` actions define the live
    file set; the snapshot at version V is "adds not later removed").
    The query builds a real table on disk: five commits each ADD one
    parquet file-group per event type (commit i owns the
    ``event_id % 5 = i`` slice), then a sixth commit REMOVES every
    'error' file — the GDPR-delete / compaction shape. The reader is
    the engine side under test: it loads ``_delta_log/*.json`` AS
    DATA (Spark JSON scan, commit version parsed from the file name),
    resolves live files with an add-vs-later-remove anti-join
    (last-writer-wins on path), and scans exactly the surviving
    parquet paths. The oracle states the algebraic result — all
    non-error events — so a hash match proves the log replay
    semantics, not just the file IO. Scale: the log is catalog
    metadata (KB per commit); the path list is the one bounded
    driver-side artifact, identical to any table catalog; data stays
    in distributed parquet scans. Artifact staging is shared and
    atomic (`staged_artifact_dir`)."""
    import json as _json
    import os
    import shutil

    from metricproxy_spark.io import staged_artifact_dir

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    types = [r[0] for r in
             events.select("event_type").distinct().orderBy("event_type").collect()]

    root = staged_artifact_dir("deltalog", sf_dir)
    if not os.path.isdir(root):
        staging = root + f".staging.{os.getpid()}"
        log_dir = os.path.join(staging, "_delta_log")
        os.makedirs(log_dir, exist_ok=True)
        for commit in range(5):
            actions = []
            if commit == 0:
                actions.append({"protocol": {"minReaderVersion": 1}})
                actions.append({"metaData": {"id": "mps-delta-demo"}})
            for et in types:
                rel = f"part-{commit:05d}-{et}"
                part = events.where(
                    (F.col("event_id") % 5 == commit)
                    & (F.col("event_type") == et)
                )
                part.write.mode("overwrite").parquet(
                    os.path.join(staging, rel)
                )
                actions.append(
                    {"add": {"path": rel, "dataChange": True}}
                )
            with open(
                os.path.join(log_dir, f"{commit:020d}.json"), "w"
            ) as fh:
                fh.write(
                    "\n".join(_json.dumps(a) for a in actions) + "\n"
                )
        removes = [
            {"remove": {"path": f"part-{c:05d}-error", "dataChange": True}}
            for c in range(5)
        ]
        with open(os.path.join(log_dir, f"{5:020d}.json"), "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in removes) + "\n")
        try:
            os.rename(staging, root)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)

    # --- the reader under test ---
    log = (
        spark.read.json(os.path.join(root, "_delta_log", "*.json"))
        .withColumn(
            "version",
            F.regexp_extract(
                F.input_file_name(), r"(\d{20})\.json", 1
            ).cast("bigint"),
        )
    )
    adds = log.where(F.col("add").isNotNull()).select(
        F.col("add.path").alias("path"), F.col("version").alias("add_v")
    )
    removes = log.where(F.col("remove").isNotNull()).select(
        F.col("remove.path").alias("path"),
        F.col("version").alias("rm_v"),
    )
    live = (
        adds.join(
            removes,
            (adds.path == removes.path) & (F.col("rm_v") > F.col("add_v")),
            "left_anti",
        )
        .select("path")
        .collect()  # bounded: the catalog file list, like any table
    )
    paths = [os.path.join(root, r["path"]) for r in live]
    return spark.read.parquet(*paths).select(
        "event_id", "event_type", "user_id", "value"
    )
