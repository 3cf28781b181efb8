"""Custom stateful operator: cumulative-counter → rate (T6).

The reference forwards ``Counter`` (cumulative) values untouched and
leaves rate derivation to the backend; a proxy-native engine should be
able to do it in-stream. Semantics: per key, given observations
(ts, v) of a monotone cumulative counter, emit
``rate = (v - v_prev) / (ts - ts_prev)`` per consecutive pair in
event-time order — with the *previous observation carried across
micro-batches* in operator state. Counter resets (v < v_prev, i.e. the
process restarted) restart the pairing and emit nothing for that gap,
the standard Prometheus/SignalFx convention.

Implementation: ``applyInPandasWithState`` — Arrow-batched per-group
pandas processing with a GroupState holding (last_ts_micros,
last_value). Within a batch the group is sorted by event time; across
batches correctness requires per-key time-ordered arrival (guaranteed
in tests by range-split staged files; on a real bus, by per-key
partition ordering à la Kafka keys).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RATE_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts", TimestampType()),
        StructField("rate", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
    ]
)


def _rate_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (metric,) = key
    if state.exists:
        last_ts_us, last_value = state.get
    else:
        last_ts_us, last_value = None, None

    out_ts: list[pd.Timestamp] = []
    out_rate: list[float] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        vals = pdf["value"].astype("float64")
        for t_us, v in zip(ts_us.to_numpy(), vals.to_numpy()):
            if last_ts_us is not None and v >= last_value and t_us > last_ts_us:
                dt_s = (t_us - last_ts_us) / 1_000_000.0
                out_ts.append(pd.Timestamp(t_us, unit="us"))
                out_rate.append((v - last_value) / dt_s)
            last_ts_us, last_value = int(t_us), float(v)

    state.update((last_ts_us, last_value))
    if out_ts:
        yield pd.DataFrame(
            {"metric": metric, "ts": out_ts, "rate": out_rate}
        )


def counter_to_rate(
    df: DataFrame,
    metric_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Apply the stateful counter→rate conversion. Works on a streaming
    DataFrame (state carried across micro-batches via checkpointed
    GroupState) — the batch twin for oracle checks is a ``lag()`` window
    over the same data."""
    from pyspark.sql import functions as F

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    slim = df.select(
        F.col(metric_col).alias("metric"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    return slim.groupBy("metric").applyInPandasWithState(
        _rate_fn,
        outputStructType=RATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOPK_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("version", LongType()),
        StructField("user_id", LongType()),
        StructField("cnt", LongType()),
        StructField("err", LongType()),
        StructField("rank", LongType()),
    ]
)

# state: parallel arrays of monitored items (space-saving summary) plus
# the total observation count (the snapshot version)
from pyspark.sql.types import ArrayType  # noqa: E402

_TOPK_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errors", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)

_TOPK_CAPACITY = 4096
_TOPK_EMIT = 5


def _make_topk_fn(capacity: int, emit: int):
    """Build the per-group space-saving function with ``capacity`` and
    ``emit`` baked into the closure (cloudpickled to workers — a module
    global would be re-imported there and ignore test overrides)."""

    def _topk_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Space-saving (Metwally, Agrawal & El Abbadi, ICDT 2005) per
        key: bounded-capacity counter summary with the classic
        guarantees — true_count ≤ cnt, cnt − err ≤ true_count, and any
        item with frequency > N/capacity is monitored. With distinct
        items ≤ capacity the summary is EXACT (err = 0), which is what
        makes the streamed query oracle-checkable; the bound regime is
        unit-tested. Emits the current top items each batch stamped
        with version = total observations, so the final snapshot per
        key is the row set with the maximum version."""
        (etype,) = key
        if state.exists:
            items_l, counts_l, errors_l, total = state.get
            summary = {
                i: [c, e] for i, c, e in zip(items_l, counts_l, errors_l)
            }
        else:
            summary, total = {}, 0

        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "user_id"])
            for u in pdf["user_id"].to_numpy():
                u = int(u)
                total += 1
                if u in summary:
                    summary[u][0] += 1
                elif len(summary) < capacity:
                    summary[u] = [1, 0]
                else:
                    # evict the minimum-count entry (ties: lowest item
                    # id, deterministic), inherit count as error bound
                    evict = min(summary, key=lambda k: (summary[k][0], k))
                    mc = summary[evict][0]
                    del summary[evict]
                    summary[u] = [mc + 1, mc]

        state.update(
            (
                list(summary.keys()),
                [v[0] for v in summary.values()],
                [v[1] for v in summary.values()],
                total,
            )
        )
        top = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))[:emit]
        if top:
            yield pd.DataFrame(
                {
                    "event_type": etype,
                    "version": total,
                    "user_id": [u for u, _ in top],
                    "cnt": [c for _, (c, _e) in top],
                    "err": [e for _, (_c, e) in top],
                    "rank": list(range(1, len(top) + 1)),
                }
            )

    return _topk_fn


def streaming_topk(
    df: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    ts_col: str = "ts",
    capacity: int = _TOPK_CAPACITY,
    emit: int = _TOPK_EMIT,
) -> DataFrame:
    """Streaming heavy hitters per key via bounded space-saving state.
    Each micro-batch emits the current top items stamped with a
    monotone version; take the max-version rows per key for the final
    answer. State is O(capacity) per key regardless of stream length —
    the sketch property that makes per-key top-k viable at 100 TB."""
    from pyspark.sql import functions as F

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    slim = df.select(
        F.col(key_col).alias("event_type"),
        F.col(item_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
    )
    return slim.groupBy("event_type").applyInPandasWithState(
        _make_topk_fn(capacity, emit),
        outputStructType=TOPK_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- alert for:-duration
# Streamed twin of queries/events.py events_alert_for_duration: the
# Prometheus alert state machine (for: 3 evals, keep_firing_for: 2)
# carried ACROSS MICRO-BATCHES — the production form of the batch
# island rewrite. Public algorithm: prometheus/rules alerting.go
# Rule.Eval (StatePending -> StateFiring, keepFiringFor hold).
#
# Each key's state is its INCIDENT LIST (one entry per cluster of
# breach islands separated by gaps <= keep) plus the open island's
# (start, length) and the last eval step seen. Every batch appends the
# new TRUE eval steps (false/missing steps are implicit hidx gaps),
# extends/opens islands and clusters incrementally, then emits the
# full incident snapshot stamped with version = last step processed —
# monotone per key, so the final answer is each key's max-version
# rows (the streaming_topk convention). State is O(incidents) per
# series, never O(evals): at 100 TB the eval series is itself a
# recording-rule rollup, and incidents are sparser still.

ALERT_FOR_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("version", LongType()),
        StructField("incident_id", LongType()),
        StructField("cluster_start", LongType()),
        StructField("cluster_end", LongType()),
        StructField("n_islands", LongType()),
        StructField("n_true", LongType()),
        StructField("fired", BooleanType()),
        StructField("fired_at", LongType()),
        StructField("resolved_at", LongType()),
    ]
)

_ALERT_FOR_STATE_SCHEMA = StructType(
    [
        StructField("cs", ArrayType(LongType())),
        StructField("ce", ArrayType(LongType())),
        StructField("n_isl", ArrayType(LongType())),
        StructField("n_true", ArrayType(LongType())),
        StructField("fire_s", ArrayType(LongType())),  # -1 = not fired
        StructField("isl_s", LongType()),
        StructField("isl_len", LongType()),
        StructField("max_h", LongType()),
    ]
)


def _make_alert_for_fn(for_steps: int, keep_gap: int):
    def _fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            cs, ce, n_isl, n_true, fire_s, isl_s, isl_len, max_h = state.get
            clusters = [
                list(t) for t in zip(cs, ce, n_isl, n_true, fire_s)
            ]
        else:
            clusters, isl_s, isl_len, max_h = [], -1, 0, -1

        # Collect ACROSS Arrow chunks before sorting: a group's
        # micro-batch rows can span multiple chunks (default
        # maxRecordsPerBatch = 10k), and per-chunk sorting would let a
        # later chunk's smaller steps trip the replay guard below and
        # be silently dropped. Cross-BATCH ordering remains the staged
        # files' contract, as for the sibling stateful operators.
        steps = sorted(
            int(h) for pdf in pdfs for h in pdf["hidx"].to_numpy()
        )
        for t in steps:
            if t <= max_h:
                continue  # replayed step from a restart: already folded
            if not clusters or t - clusters[-1][1] > keep_gap:
                # gap beyond the keep-firing grace: NEW incident
                clusters.append([t, t, 1, 1, -1])
                isl_s, isl_len = t, 1
            elif t == clusters[-1][1] + 1:
                # consecutive TRUE eval: current island extends
                clusters[-1][1] = t
                clusters[-1][3] += 1
                isl_len += 1
            else:
                # short gap (<= keep): new island, same incident
                clusters[-1][1] = t
                clusters[-1][2] += 1
                clusters[-1][3] += 1
                isl_s, isl_len = t, 1
            if isl_len >= for_steps and clusters[-1][4] < 0:
                # pending held for the full for: duration -> FIRING
                clusters[-1][4] = isl_s
            max_h = t

        state.update(
            (
                [c[0] for c in clusters],
                [c[1] for c in clusters],
                [c[2] for c in clusters],
                [c[3] for c in clusters],
                [c[4] for c in clusters],
                isl_s,
                isl_len,
                max_h,
            )
        )
        if clusters:
            yield pd.DataFrame(
                {
                    "event_type": etype,
                    "version": max_h,
                    "incident_id": range(1, len(clusters) + 1),
                    "cluster_start": [c[0] for c in clusters],
                    "cluster_end": [c[1] for c in clusters],
                    "n_islands": [c[2] for c in clusters],
                    "n_true": [c[3] for c in clusters],
                    "fired": [c[4] >= 0 for c in clusters],
                    "fired_at": [
                        c[4] + for_steps - 1 if c[4] >= 0 else None
                        for c in clusters
                    ],
                    "resolved_at": [
                        c[1] + keep_gap + 1 if c[4] >= 0 else None
                        for c in clusters
                    ],
                }
            )

    return _fn


def alert_for_islands(
    df: DataFrame,
    key_col: str = "event_type",
    step_col: str = "hidx",
    for_steps: int = 3,
    keep_gap: int = 2,
) -> DataFrame:
    """Streamed Prometheus ``for:``/``keep_firing_for:`` incident fold
    over a TRUE-eval step stream (key, step). Emits the per-key
    incident snapshot each micro-batch stamped with a monotone
    ``version``; take each key's max-version rows for the final table
    — it hash-matches the batch island rewrite."""
    from pyspark.sql import functions as F

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    slim = df.select(
        F.col(key_col).alias("event_type"),
        F.col(step_col).cast("long").alias("hidx"),
    )
    return slim.groupBy("event_type").applyInPandasWithState(
        _make_alert_for_fn(for_steps, keep_gap),
        outputStructType=ALERT_FOR_SCHEMA,
        stateStructType=_ALERT_FOR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
