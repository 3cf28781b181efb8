"""Driver-contract tests: smoke entry(), and every registered query
with an oracle hash-matches DuckDB at sf0.001 (fast) — the driver runs
the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as spark_entry
from tests.oracle_utils import assert_matches_oracle


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def _query_names():
    return sorted(spark_entry.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_runs(spark, sf_dir, name):
    df = spark_entry.queries()[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name", [n for n in _query_names() if n in spark_entry.oracle_sql()]
)
def test_query_matches_oracle(spark, sf_dir, name):
    df = spark_entry.queries()[name](spark, sf_dir)
    assert_matches_oracle(df, spark_entry.oracle_sql()[name], sf_dir)
