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
