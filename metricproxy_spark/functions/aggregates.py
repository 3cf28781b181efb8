"""Hash-stable aggregate helpers.

Floating-point summation is order-dependent; Spark's partial/final
aggregation and DuckDB's scan order will not agree bit-for-bit on
SUM(double). For the driver's value-hash comparison (and any
reproducible pipeline) we sum through exact DECIMAL arithmetic and cast
back to DOUBLE — deterministic in both engines. The cast-to-decimal of
each input double is itself deterministic (both engines round the same
IEEE value to the same decimal; exact ties are unrepresentable in
binary floats for the scales used here).

Scale note: decimal aggregation stays inside whole-stage codegen and is
map-side-combinable, so this costs a constant factor on the agg only —
no extra shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(27,4): plenty for sums of money columns at 100 TB fact-table
# cardinality (1e13 rows * 1e5 magnitude = 1e18 << 1e23 headroom) while
# keeping Spark's result type within DecimalType bounds.
_PREC = 27


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")
        / F.count(c)
    )


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )
