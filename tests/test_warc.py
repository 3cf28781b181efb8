"""WARC connector (warcwire) — codec framing + connector contract."""

from __future__ import annotations

import gzip
import io
import os
import tempfile

from metricproxy_spark.sources.warc import (
    build_response_record,
    build_warcinfo_record,
    gzip_member,
    iter_warc_records,
    register_warcwire,
)


def _parse_bytes(raw: bytes, src: str = "t.warc") -> list[tuple]:
    return list(iter_warc_records(io.BufferedReader(io.BytesIO(raw)), src))


def test_response_roundtrip_fields():
    rec = build_response_record(
        "https://example.com/a", "2001-02-03T04:05:06Z", 200,
        "text/plain; charset=utf-8", "hello world",
    )
    rows = _parse_bytes(rec)
    assert rows == [
        (
            "t.warc", "response", "https://example.com/a",
            "2001-02-03T04:05:06Z", 200, "text/plain; charset=utf-8",
            "hello world",
        )
    ]


def test_payload_framing_is_byte_counted_not_sentinel_scanned():
    """A body embedding WARC magic and CRLF-CRLF must round-trip: the
    parser counts Content-Length bytes, it never scans for markers."""
    evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ny"
    rec = build_response_record(
        "https://e/x", "1970-01-01T00:00:00Z", 404, "text/plain", evil
    )
    tail = build_response_record(
        "https://e/y", "1970-01-01T00:00:01Z", 200, "text/plain", "tail"
    )
    rows = _parse_bytes(rec + tail)
    assert [r[6] for r in rows] == [evil, "tail"]
    assert [r[4] for r in rows] == [404, 200]


def test_utf8_payload_content_length_counts_bytes():
    body = "naïve café — ünïcode"
    rec = build_response_record(
        "https://e/u", "1970-01-01T00:00:00Z", 200, "text/plain", body
    )
    assert f"Content-Length: {len(body.encode())}".encode() not in rec.split(
        b"\r\n\r\n", 1
    )[0]  # WARC-level length covers HTTP head + body, not body alone
    (row,) = _parse_bytes(rec)
    assert row[6] == body


def test_warcinfo_record_and_mixed_stream():
    raw = build_warcinfo_record("f.warc.gz") + build_response_record(
        "https://e/z", "1970-01-01T00:00:00Z", 200, "text/plain", "z"
    )
    rows = _parse_bytes(raw)
    assert [r[1] for r in rows] == ["warcinfo", "response"]
    info = rows[0]
    assert info[2] is None and info[4] is None
    assert "software: metricproxy-spark" in info[6]


def test_truncated_payload_raises():
    rec = build_response_record(
        "https://e/t", "1970-01-01T00:00:00Z", 200, "text/plain", "abcdef"
    )
    try:
        _parse_bytes(rec[:-10])
        raise AssertionError("expected truncation error")
    except ValueError as e:
        assert "truncated" in str(e)


def test_gzip_members_are_deterministic_and_concatenable():
    a = gzip_member(b"alpha")
    assert a == gzip_member(b"alpha")  # mtime pinned
    b = gzip_member(b"beta")
    assert gzip.decompress(a + b) == b"alphabeta"  # multi-member stream


def test_spark_write_read_cycle_partition_per_file(spark):
    register_warcwire(spark)
    d = tempfile.mkdtemp(prefix="mps_warc_")
    rows = [
        (f"https://e/{i}", "1970-01-01T00:00:00Z", 200 if i % 3 else 404,
         "text/plain; charset=utf-8", f"body {i}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_date string, status long, "
        "content_type string, payload string"
    )
    df.repartition(2).write.format("warcwire").mode("overwrite").save(d)
    files = [f for f in os.listdir(d) if f.endswith(".warc.gz")]
    assert len(files) == 2
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    back = spark.read.format("warcwire").option("path", d).load()
    # one partition per file — the planner schedules files independently
    assert back.rdd.getNumPartitions() == 2
    got = back.collect()
    infos = [r for r in got if r.rec_type == "warcinfo"]
    resps = [r for r in got if r.rec_type == "response"]
    assert len(infos) == 2 and len(resps) == 10
    assert sorted(r.payload for r in resps) == sorted(p for *_, p in rows)
    assert {r.http_status for r in resps} == {200, 404}


def test_overwrite_replaces_prior_job(spark):
    register_warcwire(spark)
    d = tempfile.mkdtemp(prefix="mps_warc_ow_")
    one = spark.createDataFrame(
        [("https://e/1", "1970-01-01T00:00:00Z", 200, "text/plain", "one")],
        "url string, warc_date string, status long, "
        "content_type string, payload string",
    )
    two = spark.createDataFrame(
        [("https://e/2", "1970-01-01T00:00:00Z", 200, "text/plain", "two")],
        "url string, warc_date string, status long, "
        "content_type string, payload string",
    )
    one.coalesce(1).write.format("warcwire").mode("overwrite").save(d)
    two.coalesce(1).write.format("warcwire").mode("overwrite").save(d)
    back = spark.read.format("warcwire").option("path", d).load()
    resp = [r for r in back.collect() if r.rec_type == "response"]
    assert [r.payload for r in resp] == ["two"]
