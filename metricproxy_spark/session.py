"""SparkSession factory with scale-oriented defaults (SURVEY §5, L6).

Configs chosen for the 100 TB design rule:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join strategy switch) — default in Spark 4.x but set explicitly so the
  intent survives config drift.
- Arrow on for every pandas interop path (pandas UDFs, toPandas).
- ``spark.sql.shuffle.partitions`` sized by caller: tests use a small
  number (tiny data, AQE coalesces anyway); a real cluster run would set
  this to ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "metricproxy-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    The driver harness supplies its own session to ``queries()``
    callables; everything in this package must therefore also work on a
    vanilla session (ANSI mode on, default shuffle partitions). This
    factory is for tests, bench.py and standalone use.
    """
    n = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{n}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else n),
        )
        # Bounded broadcasts only (L6): keep default 10 MB threshold; dim
        # tables (region/nation/part at test SFs) fall under it, fact
        # tables never should.
        # local[N] puts driver + all executor threads + block manager in ONE
        # JVM; an 8g heap left the 80-query bench GC-bound in its back half
        # (sim_*/stream_* ran 2-4x their isolated times — measured 151s vs
        # 87s total at sf0.01 for 8g vs 32g). On a real cluster the driver
        # carries no executor blocks, so its memory is set by cluster conf.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
