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
