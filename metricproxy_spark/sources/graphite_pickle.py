"""Graphite pickle-protocol wire (port 2004): synthesis, decode, agg.

Public spec: graphite docs "Feeding in your data — the pickle
protocol": each frame is a Python pickle of
``[(path, (timestamp, value)), ...]`` (the 4-byte length header is
the TCP framing layer, out of scope for the at-rest payloads here).
The batched companion to the plaintext line protocol — carbon-relays
emit it for efficiency.

Decode runs a RESTRICTED unpickler (``find_class`` refuses
everything): the wire only ever carries list/tuple/str/int/float,
which need no class lookups, so arbitrary-object gadgets in a
malicious frame fail to decode instead of executing. Frames are
decoded in Arrow-batched ``mapInPandas`` (the binary-payload path has
no JVM expression form — same shape as the sfx protobuf codec).

Exactness: pickle stores float64 VALUES VERBATIM (binary float8
opcode), so doubles survive the roundtrip bit-for-bit and the oracle
aggregates the source column directly — no text-repr modeling at all.
"""

from __future__ import annotations

import io
import pickle
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("ts_sec", LongType()),
        StructField("value", DoubleType()),
    ]
)

_FRAME_SCHEMA = StructType([StructField("payload", BinaryType())])


class _RestrictedUnpickler(pickle.Unpickler):
    """Refuse ALL class/global lookups — the graphite pickle wire is
    pure containers+scalars; anything else is hostile."""

    def find_class(self, module: str, name: str):  # noqa: D102
        raise pickle.UnpicklingError(
            f"graphite pickle frames may not reference {module}.{name}"
        )


def _safe_loads(raw: bytes):
    return _RestrictedUnpickler(io.BytesIO(raw)).load()


def graphite_pickle_frames(events: DataFrame) -> DataFrame:
    """One pickle frame per ``user_id % 17`` batch: the batch's events
    sorted by event_id become ``(path, (ts_sec, value))`` tuples,
    path = ``{event_type}.latency.h{user_id % 5}``. Built with
    ``applyInPandas`` per batch group (bounded: one relay flush)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        frame = [
            (p, (int(t), float(v)))
            for p, t, v in zip(pdf["path"], pdf["ts_sec"], pdf["value"])
        ]
        return pd.DataFrame(
            {"payload": [pickle.dumps(frame, protocol=2)]}
        )

    src = events.select(
        (F.col("user_id") % 17).alias("batch"),
        "event_id",
        F.concat(
            F.col("event_type"),
            F.lit(".latency.h"),
            (F.col("user_id") % 5).cast("string"),
        ).alias("path"),
        F.unix_timestamp("ts").alias("ts_sec"),
        "value",
    )
    return src.groupBy("batch").applyInPandas(build, _FRAME_SCHEMA)


def decode_graphite_pickle(frames: DataFrame, col: str = "payload") -> DataFrame:
    """Arrow-batched restricted-unpickle of frames back to flat
    (path, ts_sec, value) rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths: list[str] = []
            tss: list[int] = []
            vals: list[float] = []
            for raw in pdf[col]:
                for path, (ts, value) in _safe_loads(bytes(raw)):
                    paths.append(path)
                    tss.append(ts)
                    vals.append(value)
            yield pd.DataFrame(
                {"path": paths, "ts_sec": tss, "value": vals}
            )

    return frames.select(col).mapInPandas(gen, DECODED_SCHEMA)


def aggregate_graphite_pickle(points: DataFrame) -> DataFrame:
    """Rollup per path: count, exact-decimal value total, time range."""
    return points.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("value").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_value"),
        F.min("ts_sec").alias("min_ts_sec"),
        F.max("ts_sec").alias("max_ts_sec"),
    )
