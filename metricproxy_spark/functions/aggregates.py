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
    """Order-independent SUM of a double expression, returned as DOUBLE.

    Pick ``scale`` ≥ the true decimal places of the expression (e.g. a
    product of two 2-decimal money columns needs 4, of three needs 6):
    then the rounding in the decimal cast is boundary-free and both
    engines land on the identical decimal. A scale SMALLER than the
    true decimals puts values exactly on rounding boundaries, where
    Spark (rounds the shortest decimal repr) and DuckDB (rounds the
    binary value) disagree.
    """
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
