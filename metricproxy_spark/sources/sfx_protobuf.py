"""SignalFx protobuf wire codec (SURVEY §3.1 S3/S4).

The reference's HTTP listener accepts ``Content-Type:
application/x-protobuf`` bodies: a ``DataPointUploadMessage`` for v2
[P: protocol/signalfx/signalfxlistener.go — ProtobufDecoderV2] and a
varint-length-delimited stream of bare ``DataPoint`` messages for v1
[P: — ProtobufDecoderV1]. The message schema is the public
``com.signalfx.metrics.protobuf`` package:

    message DataPoint {            // field numbers are the wire contract
        optional string source = 1;
        optional string metric = 2;
        optional int64  timestamp = 3;       // unix millis
        optional Datum  value = 4;
        optional MetricType metricType = 5;  // GAUGE=0 ...
        repeated Dimension dimensions = 6;
    }
    message Datum { optional string strValue = 1;
                    optional double doubleValue = 2;
                    optional int64 intValue = 3; }
    message Dimension { optional string key = 1; optional string value = 2; }
    message DataPointUploadMessage { repeated DataPoint datapoints = 1; }

No protobuf runtime exists in this environment, and Spark's native
``from_protobuf`` needs a compiled descriptor file — so this module
implements the (public, stable) protobuf *wire format* directly:
base-128 varints and tag/wire-type framing. Pure Python, but it runs
inside Arrow-batched ``mapInPandas`` over whole payload blobs (each
carrying many datapoints), not per row — the S3 slow path is isolated
here exactly as SURVEY §8 risk 3 prescribes.

Malformed payloads/records are counted and dropped, never raised —
the listener's invalid-line discipline (A1).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

GAUGE, COUNTER, ENUM, CUMULATIVE_COUNTER, RATE, TIMESTAMP = range(6)
METRIC_TYPE_NAMES = {
    GAUGE: "gauge",
    COUNTER: "count",
    ENUM: "enum",
    CUMULATIVE_COUNTER: "cumulative_counter",
    RATE: "rate",
    TIMESTAMP: "timestamp",
}

# ---------------------------------------------------------------- varint


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # protobuf int64: two's complement in 64 bits
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _zigzag(v: int) -> int:
    """sint32/sint64 zigzag map (protobuf encoding spec) — the ONE
    spelling shared by every codec that needs it (remote-write
    histogram deltas, prometheus XOR chunk t0, Kafka record framing)."""
    return (v << 1) ^ (v >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ------------------------------------------------------------- encoding
# (needed for round-trip tests and the K1 forwarder's wire body)


def _tag(field: int, wire: int) -> int:
    return (field << 3) | wire


def _write_bytes_field(out: bytearray, field: int, payload: bytes) -> None:
    _write_varint(out, _tag(field, 2))
    _write_varint(out, len(payload))
    out.extend(payload)


def encode_datapoint(
    metric: str,
    timestamp_ms: int,
    double_value: float | None = None,
    int_value: int | None = None,
    str_value: str | None = None,
    metric_type: int = GAUGE,
    dimensions: dict[str, str] | None = None,
    source: str | None = None,
) -> bytes:
    datum = bytearray()
    if str_value is not None:
        _write_bytes_field(datum, 1, str_value.encode())
    elif double_value is not None:
        import struct

        _write_varint(datum, _tag(2, 1))
        datum.extend(struct.pack("<d", double_value))
    elif int_value is not None:
        _write_varint(datum, _tag(3, 0))
        _write_varint(datum, int_value)

    dp = bytearray()
    if source is not None:
        _write_bytes_field(dp, 1, source.encode())
    _write_bytes_field(dp, 2, metric.encode())
    _write_varint(dp, _tag(3, 0))
    _write_varint(dp, timestamp_ms)
    _write_bytes_field(dp, 4, bytes(datum))
    _write_varint(dp, _tag(5, 0))
    _write_varint(dp, metric_type)
    for k, v in (dimensions or {}).items():
        dim = bytearray()
        _write_bytes_field(dim, 1, k.encode())
        _write_bytes_field(dim, 2, v.encode())
        _write_bytes_field(dp, 6, bytes(dim))
    return bytes(dp)


def encode_upload_message(datapoints: list[bytes]) -> bytes:
    """v2 body: DataPointUploadMessage{ repeated DataPoint = 1 }."""
    out = bytearray()
    for dp in datapoints:
        _write_bytes_field(out, 1, dp)
    return bytes(out)


def encode_v1_stream(datapoints: list[bytes]) -> bytes:
    """v1 body: varint-length-delimited bare DataPoint messages."""
    out = bytearray()
    for dp in datapoints:
        _write_varint(out, len(dp))
        out.extend(dp)
    return bytes(out)


# ------------------------------------------------------------- decoding


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    if pos > len(buf):
        raise ValueError("truncated field")
    return pos


def _decode_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) walking one message."""
    import struct

    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        elif wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated fixed64")
            (v,) = struct.unpack_from("<d", buf, pos)
            pos += 8
            yield field, wire, v
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated bytes field")
            yield field, wire, bytes(buf[pos : pos + ln])
            pos += ln
        else:
            pos = _skip_field(buf, pos, wire)


def decode_datapoint(buf: bytes) -> dict:
    out: dict = {
        "source": None,
        "metric": None,
        "timestamp_ms": None,
        "value": None,
        "value_str": None,
        "metric_type": "gauge",
        "dimensions": {},
    }
    for field, _wire, v in _decode_fields(buf):
        if field == 1:
            out["source"] = v.decode()
        elif field == 2:
            out["metric"] = v.decode()
        elif field == 3:
            out["timestamp_ms"] = _signed64(v)
        elif field == 4:
            for df_, _w, dv in _decode_fields(v):
                if df_ == 1:
                    out["value_str"] = dv.decode()
                elif df_ == 2:
                    out["value"] = float(dv)
                elif df_ == 3:
                    out["value"] = float(_signed64(dv))
        elif field == 5:
            out["metric_type"] = METRIC_TYPE_NAMES.get(v, "gauge")
        elif field == 6:
            key = val = None
            for df_, _w, dv in _decode_fields(v):
                if df_ == 1:
                    key = dv.decode()
                elif df_ == 2:
                    val = dv.decode()
            if key is not None:
                out["dimensions"][key] = val
    if out["metric"] is None:
        raise ValueError("datapoint missing metric")
    return out


def decode_upload_message(buf: bytes) -> list[dict]:
    return [
        decode_datapoint(v)
        for field, wire, v in _decode_fields(buf)
        if field == 1 and wire == 2
    ]


def decode_v1_stream(buf: bytes) -> list[dict]:
    out = []
    pos = 0
    while pos < len(buf):
        ln, pos = _read_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("truncated v1 record")
        out.append(decode_datapoint(buf[pos : pos + ln]))
        pos += ln
    return out


# --------------------------------------------------------- Spark surface

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_str", T.StringType()),
        T.StructField("timestamp_ms", T.LongType()),
        T.StructField("metric_type", T.StringType()),
        T.StructField("dimensions", T.MapType(T.StringType(), T.StringType())),
        T.StructField("source", T.StringType()),
    ]
)


def parse_sfx_protobuf(
    df: DataFrame, body_col: str = "body", v1: bool = False
) -> DataFrame:
    """S3/S4: explode binary protobuf payload blobs into datapoint rows.

    ``mapInPandas`` so each Python invocation handles an Arrow batch of
    payloads (each payload itself carrying many datapoints) — per-blob,
    not per-datapoint, Python cost. Undecodable payloads are dropped
    (count upstream via a parallel ``observe`` if needed), matching the
    listener's 400-and-count behavior.
    """
    import pandas as pd

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    decode = decode_v1_stream if v1 else decode_upload_message

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[body_col]:
                if blob is None:
                    continue
                try:
                    rows.extend(decode(bytes(blob)))
                except ValueError:
                    continue  # count-and-drop discipline
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "source",
                        "metric",
                        "timestamp_ms",
                        "value",
                        "value_str",
                        "metric_type",
                        "dimensions",
                    ],
                )[
                    [
                        "metric",
                        "value",
                        "value_str",
                        "timestamp_ms",
                        "metric_type",
                        "dimensions",
                        "source",
                    ]
                ]

    return df.select(body_col).mapInPandas(gen, DECODED_SCHEMA)
