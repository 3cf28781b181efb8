"""CLI front door (python -m metricproxy_spark): list + run + explain
work in a fresh process."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "metricproxy_spark", *args],
        cwd=REPO,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_list_names_every_query():
    p = _run("list")
    assert p.returncode == 0, p.stderr[-500:]
    lines = [l for l in p.stdout.splitlines() if "\t" in l]
    names = {l.split("\t")[0] for l in lines}
    assert "events_type_totals" in names and len(names) > 100


def test_run_shows_rows_and_explain_shows_plan():
    p = _run("run", "events_type_totals", "--limit", "2", "--master", "local[4]")
    assert p.returncode == 0, p.stderr[-500:]
    assert "event_type" in p.stdout
    p2 = _run("run", "events_type_totals", "--explain", "--master", "local[4]")
    assert p2.returncode == 0, p2.stderr[-500:]
    assert "Physical Plan" in p2.stdout


def test_unknown_query_fails_cleanly():
    p = _run("run", "no_such_query")
    assert p.returncode == 2
    assert "unknown query" in p.stderr
