"""Local replica of the driver's DuckDB-oracle correctness check.

The driver runs each registered Spark query and its oracle SQL
side-by-side at sf0.01 and compares row-count + schema + an
order-insensitive value hash with columns sorted by name. We replicate
that here (conservatively: near-exact value equality) so mismatches
surface in pytest before the driver ever runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from metricproxy_spark.io import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_value(v: Any) -> Any:
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: catches real bugs, tolerates the last
        # couple of ulps where engines may legitimately differ.
        return f"{v:.12g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalars
        return _canon_value(v.item())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    return v


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = run_oracle(oracle_sql, sf_dir)

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"schema mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canon_rows(spark_pdf)
    o_rows = canon_rows(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
