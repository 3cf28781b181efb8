"""SignalFx protobuf wire-codec tests (SURVEY §3.1 S3/S4).

Table-driven like the reference's decoder tests [P:
protocol/signalfx/signalfxlistener_test.go]: hand-built wire bytes in,
datapoints out, malformed payloads counted-and-dropped.
"""

from __future__ import annotations

import pytest

from metricproxy_spark.sources.sfx_protobuf import (
    CUMULATIVE_COUNTER,
    decode_datapoint,
    decode_upload_message,
    decode_v1_stream,
    encode_datapoint,
    encode_upload_message,
    encode_v1_stream,
    parse_sfx_protobuf,
)


def test_roundtrip_double_gauge():
    dp = encode_datapoint(
        "cpu.load", 1700000000123, double_value=1.5,
        dimensions={"host": "a1", "dc": "us"}, source="collector",
    )
    out = decode_datapoint(dp)
    assert out["metric"] == "cpu.load"
    assert out["value"] == 1.5
    assert out["value_str"] is None
    assert out["timestamp_ms"] == 1700000000123
    assert out["metric_type"] == "gauge"
    assert out["dimensions"] == {"host": "a1", "dc": "us"}
    assert out["source"] == "collector"


def test_roundtrip_int_counter_and_str_value():
    c = decode_datapoint(
        encode_datapoint(
            "reqs", 1, int_value=-7, metric_type=CUMULATIVE_COUNTER
        )
    )
    assert c["value"] == -7.0 and c["metric_type"] == "cumulative_counter"
    s = decode_datapoint(encode_datapoint("state", 1, str_value="ok"))
    assert s["value"] is None and s["value_str"] == "ok"


def test_upload_message_and_v1_stream_framing():
    dps = [
        encode_datapoint(f"m{i}", i, double_value=float(i)) for i in range(5)
    ]
    assert [d["metric"] for d in decode_upload_message(encode_upload_message(dps))] == [
        f"m{i}" for i in range(5)
    ]
    assert [d["value"] for d in decode_v1_stream(encode_v1_stream(dps))] == [
        float(i) for i in range(5)
    ]


@pytest.mark.parametrize(
    "bad",
    [
        b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff",  # varint overrun
        b"\x0a\x10short",  # length past end
        encode_upload_message([b"\x22\x02\x11"]),  # inner datum truncated
    ],
)
def test_malformed_payloads_raise_value_error(bad):
    with pytest.raises(ValueError):
        decode_upload_message(bad) and [
            decode_datapoint(v)
            for _f, _w, v in []
        ]


def test_unknown_fields_are_skipped():
    # forward compat: append an unknown field (15, varint) — decoder
    # must ignore it, as protobuf consumers are required to.
    dp = bytearray(encode_datapoint("m", 5, double_value=2.0))
    dp += bytes([(15 << 3) | 0, 42])
    out = decode_datapoint(bytes(dp))
    assert out["metric"] == "m" and out["value"] == 2.0


def test_spark_parse_drops_malformed_keeps_good(spark):
    good = encode_upload_message(
        [encode_datapoint("a.b", 1000, double_value=3.25)]
    )
    df = spark.createDataFrame(
        [(bytearray(good),), (bytearray(b"\xff\xff garbage"),), (None,)],
        "body binary",
    )
    rows = parse_sfx_protobuf(df, "body").collect()
    assert len(rows) == 1
    assert rows[0].metric == "a.b" and rows[0].value == 3.25
    assert rows[0].dimensions == {}


def test_spark_parse_v1(spark):
    body = encode_v1_stream(
        [
            encode_datapoint("x", 1, int_value=10),
            encode_datapoint("y", 2, str_value="s"),
        ]
    )
    rows = (
        parse_sfx_protobuf(
            spark.createDataFrame([(bytearray(body),)], "body binary"),
            "body",
            v1=True,
        )
        .orderBy("metric")
        .collect()
    )
    assert [(r.metric, r.value, r.value_str) for r in rows] == [
        ("x", 10.0, None),
        ("y", None, "s"),
    ]
