"""Counter→rate on the Spark 4 ``transformWithStateInPandas`` API (T6).

Same semantics as :mod:`metricproxy_spark.streaming.stateful` (the
``applyInPandasWithState`` implementation): per key, emit
``(v - v_prev) / (ts - ts_prev)`` across consecutive cumulative-counter
observations, carrying the previous observation across micro-batches;
resets (v < v_prev) re-arm silently.

Why both implementations exist: ``applyInPandasWithState`` is the
stable GroupState API; ``transformWithState`` is its successor with
typed state variables, timers and TTL, and requires the RocksDB state
store provider — at 100 TB-of-state that provider (incremental
checkpointing, off-heap) is the one you actually deploy, so the engine
ships the operator on both APIs and the tests pin behavioral parity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older runtime
    StatefulProcessor = object  # type: ignore[assignment]
    HAS_TWS = False

if HAS_TWS:
    # transformWithState's driver<->worker state protocol is protobuf:
    # pyspark.sql.streaming.proto imports google.protobuf at query
    # start. Without that package the query crashes at runtime, so gate
    # availability on it here (this container ships pyspark without
    # protobuf; a real cluster image has it).
    import importlib.util

    try:
        HAS_TWS = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        HAS_TWS = False

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RateProcessor(StatefulProcessor):
    """Typed-state processor: one ValueState row (last_ts_us, last_value)
    per metric key."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._last = handle.getValueState(
            "last_obs", "last_ts_us long, last_value double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        if self._last.exists():
            last_ts_us, last_value = self._last.get()
        else:
            last_ts_us, last_value = None, None
        out_ts: list[pd.Timestamp] = []
        out_rate: list[float] = []
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000
            vals = pdf["value"].astype("float64")
            for t_us, v in zip(ts_us.to_numpy(), vals.to_numpy()):
                if (
                    last_ts_us is not None
                    and v >= last_value
                    and t_us > last_ts_us
                ):
                    out_ts.append(pd.Timestamp(t_us, unit="us"))
                    out_rate.append(
                        (v - last_value) / ((t_us - last_ts_us) / 1e6)
                    )
                last_ts_us, last_value = int(t_us), float(v)
        self._last.update((last_ts_us, last_value))
        if out_ts:
            yield pd.DataFrame(
                {"metric": metric, "ts": out_ts, "rate": out_rate}
            )

    def close(self) -> None:
        pass


def counter_to_rate_v2(
    df: DataFrame,
    metric_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """transformWithStateInPandas flavor of counter→rate. The session
    must use the RocksDB state store provider (see
    :data:`ROCKSDB_PROVIDER`); the caller sets
    ``spark.sql.streaming.stateStore.providerClass`` before starting
    the query."""
    from pyspark.sql import functions as F

    from metricproxy_spark.io import ensure_package_on_workers

    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    ensure_package_on_workers(df.sparkSession)
    slim = df.select(
        F.col(metric_col).alias("metric"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    return slim.groupBy("metric").transformWithStateInPandas(
        RateProcessor(),
        outputStructType="metric string, ts timestamp, rate double",
        outputMode="Append",
        timeMode="None",
    )
