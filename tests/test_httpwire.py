"""httpwire Python DataSource — connector contract tests: HTTP request
framing (Content-Length, gzip), volume-tracked bin-packed partitions in
batch, exactly-once request pickup in streaming."""

from __future__ import annotations

import os
import tempfile

from metricproxy_spark.sources.httpwire import (
    format_http_request,
    parse_http_request,
    register_httpwire,
)


def _write_request(dirpath: str, name: str, raw: bytes) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "wb") as fh:
        fh.write(raw)


def test_request_framing_roundtrip():
    raw = format_http_request(
        b'{"gauge": []}',
        path="/v2/datapoint",
        query="sfxdim_dc=west",
        gzip_body=True,
    )
    body, method, path, query, ctype = parse_http_request(raw)
    assert method == "POST"
    assert path == "/v2/datapoint"
    assert query == "sfxdim_dc=west"
    assert ctype == "application/json"
    assert body == '{"gauge": []}'  # gunzipped back to the original


def test_content_length_trims_trailing_bytes():
    raw = format_http_request(b"abc") + b"\ntrailing junk"
    body, *_ = parse_http_request(raw)
    assert body == "abc"


def test_bare_lf_head_separator():
    raw = b'POST /x HTTP/1.1\nContent-Type: text/plain\n\nhello'
    body, method, path, query, ctype = parse_http_request(raw)
    assert (body, method, path, query, ctype) == (
        "hello", "POST", "/x", "", "text/plain"
    )


def test_batch_bin_packs_by_volume(spark):
    register_httpwire(spark)
    d = tempfile.mkdtemp(prefix="mps_http_t_")
    # 8 small requests + chunk floor (64 KiB) -> they pack into ONE
    # partition instead of 8 tasks
    for i in range(8):
        _write_request(
            d, f"r{i}.http", format_http_request(b'{"n": %d}' % i, path=f"/p{i}")
        )
    df = spark.read.format("httpwire").option("path", d).load()
    assert df.count() == 8
    assert df.rdd.getNumPartitions() == 1
    assert {r.path for r in df.collect()} == {f"/p{i}" for i in range(8)}
    # tiny chunk target -> requests fan out across partitions, none lost
    wide = (
        spark.read.format("httpwire")
        .option("path", d)
        .option("chunk_bytes", "65537")
        .load()
    )
    assert wide.count() == 8


def test_stream_picks_up_new_requests_exactly_once(spark):
    register_httpwire(spark)
    d = tempfile.mkdtemp(prefix="mps_http_src_")
    ckpt = tempfile.mkdtemp(prefix="mps_http_ckpt_")
    out = tempfile.mkdtemp(prefix="mps_http_out_")
    _write_request(d, "00.http", format_http_request(b"a"))
    _write_request(d, "01.http", format_http_request(b"b", gzip_body=True))

    def drain() -> list[str]:
        q = (
            spark.readStream.format("httpwire")
            .option("path", d)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.body for r in spark.read.parquet(out).collect())

    assert drain() == ["a", "b"]
    # a new request lands; a restarted query resumes from the
    # checkpointed offset and appends ONLY the new request
    _write_request(d, "02.http", format_http_request(b"c"))
    assert drain() == ["a", "b", "c"]
