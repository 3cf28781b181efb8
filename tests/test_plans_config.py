"""Config-graph tests (SURVEY §2.1): JSON ProxyConfig → running
pipeline, mirroring the reference's end-to-end in-process test — wire
bytes in, forwarder output + counters asserted [P: main_test.go]."""

from __future__ import annotations

import json
import os

import pytest

from metricproxy_spark.plans import build_pipeline, load_config
from metricproxy_spark.streaming.sinks import count_rows_in_dir


def _write_carbon_lines(path: str, lines: list[str]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "batch1.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_load_config_validates():
    with pytest.raises(ValueError):
        load_config({"ListenFrom": []})


def test_carbon_to_csv_and_carbon_pipeline(spark, tmp_path):
    """carbon listener (commakeys deconstructor) fans out to a CSV
    forwarder and a carbon forwarder; the carbon forwarder re-emits the
    ORIGINAL wire lines byte-identically (C7 meta passthrough)."""
    src = str(tmp_path / "carbon_in")
    lines = [
        "servers.api.cpu[dc=us,role=web] 0.75 1700000000",
        "servers.db.mem 1024 1700000060",
        "bogus line",  # invalid: counted-and-dropped by the parser
        "servers.api.cpu[dc=eu] 0.25 1700000120",
    ]
    _write_carbon_lines(src, lines)
    cfg = {
        "ListenFrom": [
            {
                "Type": "carbon",
                "Source": src,
                "MetricDeconstructor": "commakeys",
            }
        ],
        "ForwardTo": [
            {"Type": "csv", "Name": "debug", "Path": str(tmp_path / "csv_out")},
            {"Type": "carbon", "Name": "relay", "Path": str(tmp_path / "carbon_out")},
        ],
    }
    # config also round-trips through JSON text like the reference's file
    cfg_path = tmp_path / "proxy.json"
    cfg_path.write_text(json.dumps(cfg))

    pipe = build_pipeline(spark, str(cfg_path))
    stats = pipe.run_available_now(str(tmp_path / "ckpt"))

    assert stats["datapoints_in"] == 3  # bogus line dropped at parse
    assert stats["sink.debug.datapoints"] == 3
    assert stats["sink.relay.datapoints"] == 3
    assert count_rows_in_dir(spark, str(tmp_path / "csv_out"), "csv") == 3

    relayed = {
        r.value
        for r in spark.read.text(str(tmp_path / "carbon_out")).collect()
    }
    assert relayed == {l for l in lines if l != "bogus line"}  # byte fidelity

    # commakeys deconstruction reached the CSV sink as dimensions
    csv_rows = spark.read.csv(str(tmp_path / "csv_out")).collect()
    joined = "\n".join(",".join(str(c) for c in r) for r in csv_rows)
    assert "servers.api.cpu" in joined and "dc -> us" in joined


def test_buffer_size_sheds(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_carbon_lines(
        src, [f"m{i} {i} 170000000{i % 10}" for i in range(50)]
    )
    cfg = {
        "ListenFrom": [{"Type": "carbon", "Source": src}],
        "ForwardTo": [
            {
                "Type": "csv",
                "Path": str(tmp_path / "out"),
                "BufferSize": 20,
            }
        ],
    }
    pipe = build_pipeline(spark, cfg)
    stats = pipe.run_available_now(str(tmp_path / "ckpt"))
    assert stats["datapoints_in"] == 50
    assert stats["datapoints_dropped"] == 30
    assert count_rows_in_dir(spark, str(tmp_path / "out"), "csv") == 20


def test_signalfx_live_listener_from_config(spark, tmp_path):
    """A config-declared signalfx listener with a ListenAddr starts a
    REAL HTTP endpoint: points POSTed over TCP land in the CSV
    forwarder after one availableNow drain, with counters agreeing."""
    import http.client

    spool = str(tmp_path / "sfx_spool")
    out = str(tmp_path / "csv_out")
    cfg = {
        "ListenFrom": [
            {
                "Type": "signalfx",
                "ListenAddr": "127.0.0.1:0",
                "Source": spool,
            }
        ],
        "ForwardTo": [{"Type": "csv", "Name": "csv", "Path": out}],
    }
    pipe = build_pipeline(spark, cfg)
    try:
        [lis] = pipe.live_listeners
        body = json.dumps(
            {
                "gauge": [
                    {
                        "metric": "live.cpu",
                        "value": 0.5,
                        "timestamp": 1700000000000,
                        "dimensions": {"dc": "us"},
                    },
                    {
                        "metric": "live.mem",
                        "value": 2048.0,
                        "timestamp": 1700000001000,
                        "dimensions": {},
                    },
                ]
            }
        ).encode()
        conn = http.client.HTTPConnection(lis.host, lis.port, timeout=10)
        conn.request(
            "POST",
            "/v2/datapoint",
            body=body,
            headers={"Content-Type": "application/json"},
        )
        assert conn.getresponse().status == 200
        conn.close()
        stats = pipe.run_available_now(str(tmp_path / "ckpt"))
    finally:
        pipe.close_listeners()
    assert stats["datapoints_in"] == 2
    assert stats["sink.csv.datapoints"] == 2
    assert count_rows_in_dir(spark, out, fmt="csv") == 2


def test_statsd_live_listener_from_config(spark, tmp_path):
    """A statsd ListenFrom with a ListenAddr binds a REAL line socket
    (UDP datagram mode via Protocol), clients push multi-metric
    packets, and the spool drains through the pipeline to a CSV sink
    with sample-rate-corrected values and processing-time stamps."""
    import socket
    import time

    from metricproxy_spark.plans.config import build_pipeline
    from metricproxy_spark.streaming.sinks import count_rows_in_dir

    spool = str(tmp_path / "statsd_spool")
    cfg = {
        "ListenFrom": [
            {
                "Type": "statsd",
                "Source": spool,
                "ListenAddr": "127.0.0.1:0",
                "Protocol": "udp",
            }
        ],
        "ForwardTo": [
            {"Type": "csv", "Name": "out", "Path": str(tmp_path / "csv_out")}
        ],
    }
    pipe = build_pipeline(spark, cfg)
    try:
        lis = pipe.live_listeners[0]
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(
            b"api.req:2|c|@0.5\nweb.mem:512|g\n", (lis.host, lis.port)
        )
        s.sendto(b"api.lat:33|ms\nusers:u7|s\n", (lis.host, lis.port))
        s.close()
        deadline = time.time() + 10
        while lis.accepted_lines < 4 and time.time() < deadline:
            time.sleep(0.02)
        lis.flush()
        stats = pipe.run_available_now(str(tmp_path / "ckpt"))
        assert stats["datapoints_in"] == 4
        assert count_rows_in_dir(spark, str(tmp_path / "csv_out"), "csv") == 4
    finally:
        pipe.close_listeners()


def test_influx_listener_from_config(spark, tmp_path):
    """Influx line-protocol spool drains with wire timestamps and tag
    dimensions intact."""
    import os

    from metricproxy_spark.plans.config import build_pipeline
    from metricproxy_spark.streaming.sinks import count_rows_in_dir

    spool = str(tmp_path / "influx_spool")
    os.makedirs(spool)
    with open(os.path.join(spool, "lines_000000000000.wire"), "w") as fh:
        fh.write(
            "cpu,host=h1,region=r1 value=0.5,count=3i 1700000000000000000\n"
            "mem,host=h2,region=r2 value=99.25,count=1i 1700000060000000000\n"
        )
    cfg = {
        "ListenFrom": [{"Type": "influx", "Source": spool}],
        "ForwardTo": [
            {"Type": "csv", "Name": "out", "Path": str(tmp_path / "csv_out")}
        ],
    }
    pipe = build_pipeline(spark, cfg)
    stats = pipe.run_available_now(str(tmp_path / "ckpt"))
    assert stats["datapoints_in"] == 2
    assert count_rows_in_dir(spark, str(tmp_path / "csv_out"), "csv") == 2
