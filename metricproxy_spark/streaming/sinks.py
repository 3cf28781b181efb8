"""Forwarder-shaped sinks (SURVEY §3.2 K1–K3).

Each factory returns a ``BatchWriter`` for :class:`ProxyPipeline`.
File-backed forms are the test/driver surface; the SignalFx forwarder
takes an injectable ``transport`` so a real deployment can POST the
serialized payloads (the HTTP client itself is out of scope here — no
network in this environment).

Delivery semantics: ``foreachBatch`` is AT-LEAST-ONCE across restarts —
a batch whose source offsets were not yet committed replays with the
same ``batch_id`` (demonstrated in
tests/test_streaming.py::test_checkpoint_resume_idempotent_sink_exactly_once).
The append-mode writers here therefore match the reference forwarders'
at-least-once posture; for effective exactly-once, key the write by
``batch_id`` (e.g. write to ``{path}/batch={batch_id}`` with overwrite,
or an idempotent upsert) — the ProxyPipeline hands every writer the id
for exactly this purpose.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metricproxy_spark.sources.carbon import to_carbon_lines


def csv_sink(path: str) -> Callable[[DataFrame, int], None]:
    """K3: CSV debug forwarder [P: protocol/csv/csvforwarder.go] — the
    reference appends one line per datapoint to a local file; here each
    micro-batch appends partitioned CSV files (same contract: every
    datapoint durably on disk, append-only)."""

    def write(df: DataFrame, batch_id: int) -> None:
        out = df
        for f in out.schema.fields:
            if not f.dataType.typeName() in (
                "string", "long", "integer", "double", "float", "boolean",
                "timestamp", "date", "short", "byte", "decimal",
            ):
                out = out.withColumn(f.name, F.col(f.name).cast("string"))
        out.write.mode("append").option("header", "false").csv(path)

    return write


def carbon_sink(
    path: str,
    metric_col: str = "metric",
    value_col: str = "value",
    ts_col: str = "ts",
    meta_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """K2: carbon forwarder [P: protocol/carbon/carbonforwarder.go] —
    serializes datapoints back to graphite plaintext. Uses the C7
    raw-line passthrough when ``meta_col`` carries the original wire
    line (carbon→carbon byte fidelity), else rebuilds ``name value
    unix_ts``. Events are dropped, as in the reference."""

    def write(df: DataFrame, batch_id: int) -> None:
        prepared = df.select(
            F.col(metric_col).alias("metric"),
            F.col(value_col).alias("value"),
            (
                F.col("value_str")
                if "value_str" in df.columns
                else F.lit(None).cast("string")
            ).alias("value_str"),
            F.unix_timestamp(F.col(ts_col)).alias("epoch_s"),
            *([F.col(meta_col).alias("meta")] if meta_col else []),
        )
        lines = prepared.select(
            to_carbon_lines(
                prepared, meta_col="meta" if meta_col else None
            ).alias("value")
        )
        lines.write.mode("append").text(path)

    return write


def signalfx_sink(
    path: str | None = None,
    transport: Callable[[Iterable[str]], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """K1: SignalFx forwarder [P: protocol/signalfx/signalfxforwarder.go
    — AddDatapoints, datumForPoint]. Serializes each datapoint to the
    v2 JSON wire shape (metric/value/dimensions/timestamp-millis) and
    hands payload lines to ``transport`` partition-by-partition (the
    reference POSTs batches; partition-parallel posting is the F4
    "DrainingThreads" analog). Default transport appends JSON-lines
    files under ``path``."""

    def write(df: DataFrame, batch_id: int) -> None:
        cols = set(df.columns)
        dims = (
            F.col("dimensions")
            if "dimensions" in cols
            else F.expr("map()").cast("map<string,string>")
        )
        payload = df.select(
            F.to_json(
                F.struct(
                    F.col("metric").alias("metric"),
                    F.col("value").alias("value"),
                    dims.alias("dimensions"),
                    # v2 wire carries MILLISECOND timestamps; unix_millis
                    # keeps sub-second precision (unix_timestamp*1000
                    # truncates to whole seconds).
                    F.unix_millis(F.col("ts")).alias("timestamp"),
                )
            ).alias("line")
        )
        if transport is not None:
            def post(rows):
                transport([r.line for r in rows])

            payload.foreachPartition(post)
        else:
            assert path is not None, "signalfx_sink needs a path or transport"
            payload.write.mode("append").text(path)

    return write


def upsert_sink(
    path: str,
    keys: list[str],
    seq_cols: list[str],
    delete_predicate=None,
) -> Callable[[DataFrame, int], None]:
    """MERGE-style keyed snapshot sink (CDC upsert): each micro-batch
    is collapsed to its last-writer-wins state per key and merged onto
    the previous snapshot; tombstones (rows matching
    ``delete_predicate``) remove their key.

    Exactly-once under foreachBatch's at-least-once replay: snapshots
    are versioned by ``batch_id`` (``{path}/snap_v{N}``) and batch N
    always merges onto the newest snapshot with version < N — a
    replayed batch recomputes the identical snapshot instead of
    double-applying. At warehouse scale the same contract is Delta's
    MERGE + idempotent txn; here it is plain parquet + deterministic
    versioning. Scale note: the merge shuffles once on the key; with
    the snapshot bucketed by key this becomes a co-located rewrite of
    changed buckets only.
    """

    def write(df: DataFrame, batch_id: int) -> None:
        from metricproxy_spark.operators.cdc import (
            latest_snapshot,
            merge_upsert,
        )

        os.makedirs(path, exist_ok=True)
        versions = sorted(
            int(d.rsplit("_v", 1)[1])
            for d in os.listdir(path)
            if d.startswith("snap_v")
        )
        prior = [v for v in versions if v < batch_id]
        # Keep tombstone rows as within-batch winners here — they must
        # survive to the merge to delete base keys.
        batch_latest = latest_snapshot(df, keys, seq_cols)
        if prior:
            base = df.sparkSession.read.parquet(
                os.path.join(path, f"snap_v{prior[-1]}")
            )
            merged = merge_upsert(
                base, batch_latest, keys, seq_cols, delete_predicate
            )
        elif delete_predicate is not None:
            merged = batch_latest.filter(~delete_predicate)
        else:
            merged = batch_latest
        merged.write.mode("overwrite").parquet(
            os.path.join(path, f"snap_v{batch_id}")
        )

    return write


def read_latest_snapshot(spark, path: str) -> DataFrame | None:
    """Newest snapshot an :func:`upsert_sink` has produced, or None."""
    if not os.path.exists(path):
        return None
    versions = sorted(
        int(d.rsplit("_v", 1)[1])
        for d in os.listdir(path)
        if d.startswith("snap_v")
    )
    if not versions:
        return None
    return spark.read.parquet(os.path.join(path, f"snap_v{versions[-1]}"))


def count_rows_in_dir(spark, path: str, fmt: str = "csv") -> int:
    """Test helper: rows a sink has durably written so far."""
    if not os.path.exists(path):
        return 0
    if fmt == "csv":
        return spark.read.option("header", "false").csv(path).count()
    return spark.read.format(fmt).load(path).count()
