"""asof_join unit semantics (ADVICE r2): NULL-payload atomicity — the
struct-forward-fill design exists precisely so a legit NULL field in
the LATEST right row is carried as-is, never stitched with an older
non-NULL value from a previous row."""

from __future__ import annotations

import datetime as dt

from metricproxy_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_null_payload_field_travels_atomically(spark):
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "v1", 10.0),
            # latest right row: state present, value legitimately NULL
            (1, _ts("2024-01-01T01:00:00"), "v2", None),
        ],
        "k int, ts timestamp, state string, value double",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T02:00:00"), "probe")],
        "k int, ts timestamp, tag string",
    )
    [row] = asof_join(left, right, on="k").collect()
    assert row.state_asof == "v2"
    assert row.value_asof is None  # NOT 10.0 — no cross-row stitching


def test_inclusive_boundary_and_missing_match(spark):
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00:00"), "v1")],
        "k int, ts timestamp, state string",
    )
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), "at-boundary"),  # ts equal: match
            (1, _ts("2024-01-01T00:30:00"), "before"),  # no prior right row
            (2, _ts("2024-01-01T02:00:00"), "other-key"),  # key never seen
        ],
        "k int, ts timestamp, tag string",
    )
    got = {r.tag: r.state_asof for r in asof_join(left, right, on="k").collect()}
    assert got == {"at-boundary": "v1", "before": None, "other-key": None}
