"""Count-min sketch (Cormode & Muthukrishnan 2005) as DataFrame ops.

Spark ships a ``count_min_sketch`` aggregate but no SQL-side lookup —
and a sketch you can't query from the plan is useless in a pipeline.
This builds the d×w counter table AS A DATAFRAME: one row per
(seed, bucket) cell, where bucket = xxhash64(seed, item) mod w. The
whole sketch is a single hash aggregate with map-side combine, so at
100 TB the shuffle carries at most d·w cells per mapper — the sketch
IS the shuffle compression. Point queries join candidate items against
the cell table (d·w rows — broadcast) and take the min over seeds.

Estimates are deterministic (seeded xxhash64), always ≥ the true
count, and within εN (ε = e/w) with probability 1−e^−d — the bound
tests live in tests/test_round5_ops.py (TestCountMinSketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, item: Column | str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Aggregate a count-min sketch: one row per (seed, bucket) cell."""
    c = F.col(item) if isinstance(item, str) else item
    rows = df.select(
        c.alias("_item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed"),
    )
    return (
        rows.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col("seed"), F.col("_item")), width)
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item: Column | str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate row: adds ``cms_est``
    = min over seeds of the item's cell counter. The sketch side is
    d·w rows — broadcast, so this is a map-side join.

    The probe is a LEFT join with missing cells coalesced to 0: a
    (seed, bucket) cell no build item ever hashed into has no row in
    the sketch DataFrame, and the CMS contract says an empty cell
    estimates 0 — an inner join would silently drop (or min over only
    the collided subset of seeds for) candidates absent from the
    build data, voiding the 1−e^−d guarantee for them."""
    c = F.col(item) if isinstance(item, str) else item
    probes = candidates.withColumn(
        "_seed", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    ).withColumn("_bucket", F.pmod(F.xxhash64(F.col("_seed"), c), width))
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("_seed") == F.col("seed"))
        & (F.col("_bucket") == F.col("bucket")),
        "left",
    )
    keys = [f.name for f in candidates.schema.fields]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("cell_n"), F.lit(0))).alias("cms_est"))
    )
