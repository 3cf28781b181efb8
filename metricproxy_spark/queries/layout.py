"""Data-layout & sampling queries — scale infrastructure the 100 TB
deployment needs around the engine proper (SURVEY §3.8 L6 extensions).

- Z-order clustering keys: multi-column data skipping. Sorting a fact
  table by the Morton (bit-interleaved) code of two keys makes every
  parquet row-group cover a narrow RANGE of BOTH columns, so min/max
  row-group stats prune scans on either predicate — the technique
  Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``. The query computes
  the codes and proves the locality property the layout would deliver.
- Deterministic stratified sampling: per-stratum rates via a
  multiplicative hash — reproducible across engines/runs/partitions
  (``sample()``/``TABLESAMPLE`` are not), which is what dataset
  downsampling needs when train/eval splits must be stable.

Both are pure map-side projections/aggregations: no shuffle beyond the
final small agg, no Python, engine-portable integer arithmetic (the
DuckDB oracle runs the identical bit math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.io import load_table, read_parquet_cached
from metricproxy_spark.registry import register

# Morton spread: insert a 0 bit between consecutive bits of a 16-bit
# int (classic magic-number bit twiddling, public domain technique).
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_sql(col: str) -> str:
    """One SQL expression string spreading ``col``'s low 16 bits —
    identical text works in Spark SQL and DuckDB (both support
    ``&``/``|``/``<<`` on BIGINT)."""
    e = f"({col} & 65535)"
    for shift, mask in _SPREAD_STEPS:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def zorder_key(x: str, y: str) -> str:
    """SQL expression for the 32-bit Morton code interleaving two
    16-bit keys: z = spread(x) | spread(y) << 1."""
    return f"({_spread_sql(x)} | ({_spread_sql(y)} << 1))"


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH ext AS (
        SELECT max(l_partkey) + 1 AS pmax, max(l_suppkey) + 1 AS smax
        FROM lineitem
    ), grid AS (
        SELECT (l_partkey * 65536) // pmax AS gx,
               (l_suppkey * 65536) // smax AS gy
        FROM lineitem, ext
    ), coded AS (
        SELECT gx, gy, {zorder_key('gx', 'gy')} AS z FROM grid
    )
    SELECT CAST(z >> 22 AS BIGINT) AS z_bucket,
           count(*) AS n,
           min(gx) AS min_x, max(gx) AS max_x,
           min(gy) AS min_y, max(gy) AS max_y
    FROM coded
    GROUP BY 1
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering codes over (l_partkey, l_suppkey),
    aggregated per would-be file bucket (top 10 bits of the code).

    Keys are first quantized onto a 16-bit grid by their max (the
    rank-range quantization every ZORDER writer does, here via one
    scalar-aggregated broadcast row), then bit-interleaved — 4
    shift-mask steps per key, whole-stage-codegen'd. The per-bucket
    min/max bounds ARE the row-group stats a writer sorted by ``z``
    would produce: every bucket covers ≤ 1/32 of BOTH key domains, so
    a predicate on EITHER key prunes ~31/32 of the files — the
    multi-dimensional analogue of partition pruning, and the layout
    step that makes 100 TB interactive. The identical interleave
    expression text runs in DuckDB, so the code values (not just the
    shape) are oracle-checked.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ext = li.agg(
        (F.max("l_partkey") + 1).alias("pmax"),
        (F.max("l_suppkey") + 1).alias("smax"),
    )
    grid = li.crossJoin(F.broadcast(ext)).select(
        F.expr("(l_partkey * 65536) div pmax").alias("gx"),
        F.expr("(l_suppkey * 65536) div smax").alias("gy"),
    )
    coded = grid.select(
        "gx", "gy", F.expr(zorder_key("gx", "gy")).alias("z")
    )
    return coded.groupBy(
        F.expr("z >> 22").cast("bigint").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gx").alias("min_x"),
        F.max("gx").alias("max_x"),
        F.min("gy").alias("min_y"),
        F.max("gy").alias("max_y"),
    )


# Per-segment sampling rates (percent). CASE-expression form so the
# identical rule text runs in both engines; at scale this would come
# from a broadcast config table.
_RATES = (
    ("BUILDING", 20),
    ("AUTOMOBILE", 10),
    ("MACHINERY", 5),
)
_RATE_CASE = (
    "CASE c_mktsegment "
    + " ".join(f"WHEN '{seg}' THEN {pct}" for seg, pct in _RATES)
    + " ELSE 2 END"
)


@register(
    "layout_stratified_sample",
    oracle=f"""
    WITH rated AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST((c_custkey * 2654435761) % 4294967296 AS BIGINT) % 100 AS h,
               {_RATE_CASE} AS rate
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, c_acctbal, rate
    FROM rated WHERE h < rate
    """,
)
def layout_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of customers: each market
    segment keeps its own fraction (20/10/5/2%), membership decided by
    the Knuth multiplicative hash of the key — not ``sample()``, whose
    output depends on partitioning and seed plumbing and differs
    between engines. Same rows come back on every run, every engine,
    every cluster size: the property training-data downsampling needs.
    Map-only (no shuffle); the rate table is a CASE expression here and
    a broadcast-joined config dim at production scale.
    """
    cust = load_table(spark, sf_dir, "customer")
    rated = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        (
            ((F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296))
            .cast("bigint") % 100
        ).alias("h"),
        F.expr(_RATE_CASE).alias("rate"),
    )
    return rated.filter(F.col("h") < F.col("rate")).select(
        "c_custkey", "c_mktsegment", "c_acctbal", "rate"
    )


@register(
    "layout_skew_report",
    oracle="""
    WITH b AS (
        SELECT 'lineitem.l_suppkey' AS key_name, l_suppkey % 32 AS bucket,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'lineitem.l_partkey', l_partkey % 32, count(*)
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'events.user_id', user_id % 32, count(*)
        FROM events GROUP BY 1, 2
    )
    SELECT key_name,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(n) AS BIGINT) AS min_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(sum(n) AS BIGINT) AS total_rows,
           round(32.0 * max(n) / sum(n), 6) AS skew_factor
    FROM b GROUP BY key_name
    """,
)
def layout_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-planning skew report: for each candidate shuffle key,
    the 32-bucket histogram's min/max/skew factor (max over mean) —
    the number that decides between plain hash partitioning, salting
    (operators/scale.py) and AQE skew-join before a 100 TB run. Three
    key-space-bounded aggs unioned; modulo buckets (not hash) so both
    engines bucket identically."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def bucketed(df, key_name: str, col: str):
        return (
            df.groupBy((F.col(col) % 32).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(key_name).alias("key_name"), "bucket", "n")
        )

    b = (
        bucketed(li, "lineitem.l_suppkey", "l_suppkey")
        .unionByName(bucketed(li, "lineitem.l_partkey", "l_partkey"))
        .unionByName(bucketed(ev, "events.user_id", "user_id"))
    )
    return b.groupBy("key_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.min("n").cast("bigint").alias("min_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.round(32.0 * F.max("n") / F.sum("n"), 6).alias("skew_factor"),
    )


def _staged_dir(tag: str, sf_dir: str) -> str:
    """Per-(artifact, sf, content-fingerprint) staging path under the
    system tempdir — content is a pure function of the testdata (the
    fingerprint invalidates on regeneration), shared across processes
    via atomic-rename publish (see _publish)."""
    from metricproxy_spark.io import staged_artifact_dir

    return staged_artifact_dir(tag, sf_dir)


def _publish(staging: str, final: str) -> None:
    import os
    import shutil

    try:
        os.rename(staging, final)
    except OSError:  # lost the race; the winner's copy is identical
        shutil.rmtree(staging, ignore_errors=True)


@register(
    "layout_partition_pruning",
    oracle="""
    SELECT CAST(user_id % 8 AS BIGINT) AS user_bucket,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events
    WHERE user_id % 8 IN (2, 5)
    GROUP BY 1, 2
    """,
)
def layout_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned WRITE + pruned READ: events land
    partitioned by ``user_bucket = user_id % 8`` (the layout step), a
    predicate on the partition column then reads ONLY the 2 matching
    directories — ``PartitionFilters`` in the scan, 6/8 of the data
    never opened. This is the first lever of 100 TB interactivity
    (date/tenant partitioning); the plan discipline is asserted in
    tests/test_scale.py. Layout is staged once per sf (atomic-rename
    publish) so repeated runs measure the READ, not the write."""
    import os

    tgt = _staged_dir("part_events", sf_dir)
    if not os.path.isdir(tgt):
        import tempfile

        staging = tempfile.mkdtemp(prefix="mps_part_stage_")
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn(
                "user_bucket", (F.col("user_id") % 8).cast("bigint")
            )
            .repartition("user_bucket")
            .write.mode("overwrite")
            .partitionBy("user_bucket")
            .parquet(staging)
        )
        _publish(staging, tgt)
    part = read_parquet_cached(spark, tgt)
    return (
        part.where(F.col("user_bucket").isin(2, 5))
        .groupBy("user_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "layout_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE fact⋈fact join via bucketed layout: orders and
    lineitem are written once as tables bucketed (8 buckets) AND
    sorted on the join key, so the sort-merge join consumes both scans
    with NO Exchange on either input (only cheap per-file local sorts
    remain) — the co-location contract that turns the biggest
    recurring shuffle of a 100 TB star schema into a local merge. The
    single Exchange left in the whole plan is the final 5-key agg.
    Plan asserted in tests/test_scale.py; the oracle checks the join's
    values against the plain path.

    The merge-join hint pins SMJ (a broadcast join would also be
    shuffle-free at test scale but proves nothing about co-location).
    """
    import os

    from metricproxy_spark.io import sf_fingerprint

    # Catalog table names carry the same content fingerprint as the
    # data path — regenerated testdata registers fresh tables instead
    # of resolving a stale catalog entry over vanished files.
    sf = (
        sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
        + "_"
        + sf_fingerprint(sf_dir)
    )
    t_orders, t_lineitem = f"mps_bkt_orders_{sf}", f"mps_bkt_lineitem_{sf}"
    # GC superseded catalog entries: same sf name, older fingerprint —
    # their LOCATION dirs were removed by staged_artifact_dir's sweep,
    # so the stale EXTERNAL entries would only dangle.
    sf_name = sf.rsplit("_", 1)[0]
    for t in spark.catalog.listTables():
        for stem in ("mps_bkt_orders_", "mps_bkt_lineitem_"):
            if (
                t.name.startswith(f"{stem}{sf_name}_")
                and t.name not in (t_orders, t_lineitem)
                and "_staging_" not in t.name
            ):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    for tbl, src, key, cols, ddl_cols in (
        (
            t_orders,
            "orders",
            "o_orderkey",
            ["o_orderkey", "o_orderpriority"],
            "o_orderkey BIGINT, o_orderpriority STRING",
        ),
        (
            t_lineitem,
            "lineitem",
            "l_orderkey",
            ["l_orderkey", "l_extendedprice"],
            "l_orderkey BIGINT, l_extendedprice DOUBLE",
        ),
    ):
        if spark.catalog.tableExists(tbl):
            continue
        path = _staged_dir(f"bkt_{src}", sf_dir)
        if not os.path.isdir(path):
            # Write to a staging dir and atomic-rename into place
            # (same _publish discipline as every other shared
            # artifact) — a concurrent reader must never observe a
            # half-written layout at the final path. saveAsTable with
            # an explicit path makes an EXTERNAL table, so dropping
            # the bookkeeping entry keeps the files.
            staging = f"{path}.staging.{os.getpid()}"
            stage_tbl = f"{tbl}_staging_{os.getpid()}"
            (
                load_table(spark, sf_dir, src)
                .select(*cols)
                .write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", staging)
                .saveAsTable(stage_tbl)
            )
            spark.sql(f"DROP TABLE IF EXISTS {stage_tbl}")
            _publish(staging, path)
        # Register the published layout as an EXTERNAL bucketed table
        # (DDL only, no data write); bucket/sort spec matches the
        # writer's, and the path is complete-by-construction.
        spark.sql(
            f"""CREATE TABLE {tbl} ({ddl_cols}) USING PARQUET
            CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS
            LOCATION '{path}'"""
        )
    o = spark.table(t_orders).hint("merge")
    l = spark.table(t_lineitem)
    joined = l.join(o, l.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "layout_runtime_bloom_filter",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,4))) AS DOUBLE)
               AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def layout_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 runtime row-level filtering: a selective dim-side predicate
    (URGENT orders, ~20% of keys) injects a RUNTIME BLOOM FILTER on
    the fact side — Catalyst aggregates a bloom_filter_agg over the
    creation side's join keys and plants might_contain(l_orderkey)
    into the lineitem scan, so ~80% of fact rows drop BEFORE the join
    shuffle instead of after it. At 100 TB this is the difference
    between shuffling the fact table and shuffling a fifth of it when
    the dim filter isn't a partition column. Local scans sit under the
    10 GB application-side default, so the query scopes the threshold
    to 0 (and disables broadcast, which would otherwise satisfy the
    small side first); at warehouse scale the defaults fire on their
    own. The plan assertion lives in TestRound6PlanDiscipline."""
    scoped = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lineitems"),
                F.sum(F.col("l_quantity").cast("decimal(27,4)"))
                .cast("double")
                .alias("sum_qty"),
            )
        )
        # materialize the plan under the scoped confs: the runtime
        # filter is injected at optimization time, so the result must
        # be computed before the confs are restored
        rows = out.collect()
        return spark.createDataFrame(
            rows, "o_orderpriority string, n_lineitems bigint, sum_qty double"
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_HILBERT_ORDER = 8  # 8-bit grid: 256x256 cells, d in [0, 65536)


def _hilbert_level_sql(s: int) -> dict[str, str]:
    """One Hilbert xy->d refinement level (the classic public-domain
    d2xy/xy2d loop body, Wikipedia "Hilbert curve" convert routines)
    as engine-portable SQL snippets over columns (hx, hy, hd):

        rx = (x & s) > 0; ry = (y & s) > 0
        d += s*s * ((3*rx) XOR ry)
        if ry == 0: { if rx == 1: x = s-1-x; y = s-1-y }; swap(x, y)

    The quadrant term (3*rx) XOR ry is spelled as a CASE over the four
    (rx, ry) combinations because `^` means XOR in Spark but POWER in
    DuckDB — the CASE text is identical in both."""
    rx = f"CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END"
    ry = f"CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END"
    quad = (
        f"CASE WHEN ({rx}) = 0 AND ({ry}) = 0 THEN 0"
        f" WHEN ({rx}) = 0 THEN 1"
        f" WHEN ({ry}) = 0 THEN 3 ELSE 2 END"
    )
    flip = f"CASE WHEN ({rx}) = 1 THEN {s} - 1 - "
    new_x = (
        f"CASE WHEN ({ry}) = 0 THEN ({flip}hy ELSE hy END)"
        f" ELSE hx END"
    )
    new_y = (
        f"CASE WHEN ({ry}) = 0 THEN ({flip}hx ELSE hx END)"
        f" ELSE hy END"
    )
    return {
        "hd": f"hd + {s * s} * ({quad})",
        "hx": new_x,
        "hy": new_y,
    }


@register(
    "layout_hilbert_stats",
    oracle=(
        """
    WITH ext AS (
        SELECT max(l_partkey) + 1 AS pmax, max(l_suppkey) + 1 AS smax
        FROM lineitem
    ), l0 AS (
        SELECT (l_partkey * 256) // pmax AS hx,
               (l_suppkey * 256) // smax AS hy,
               CAST(0 AS BIGINT) AS hd
        FROM lineitem, ext
    )"""
        + "".join(
            ", l{n} AS (SELECT {hd} AS hd, {hx} AS hx, {hy} AS hy"
            " FROM l{p})".format(
                n=i + 1,
                p=i,
                **_hilbert_level_sql(1 << (_HILBERT_ORDER - 1 - i)),
            )
            for i in range(_HILBERT_ORDER)
        )
        + f"""
    SELECT CAST(hd >> 10 AS BIGINT) AS h_bucket,
           count(*) AS n,
           min(hx) AS min_x, max(hx) AS max_x,
           min(hy) AS min_y, max(hy) AS max_y
    FROM l{_HILBERT_ORDER}
    GROUP BY 1
    """
    ),
)
def layout_hilbert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-curve clustering codes over (l_partkey, l_suppkey) —
    the locality-superior alternative to `layout_zorder_stats`'s
    Morton codes (the Hilbert curve never makes the long diagonal
    jumps Z-order does, so consecutive file buckets cover tighter key
    rectangles; it is what Databricks liquid clustering moved to).
    Keys quantize onto an 8-bit grid, then 8 unrolled xy->d
    refinement levels run as chained projections — the IDENTICAL
    per-level CASE text executes as CTE stages in DuckDB, so the
    curve positions themselves (not just the bucket shape) are
    value-checked; note the rotation state threads through levels,
    which is why Hilbert needs the chain while Morton is a stateless
    interleave. Per-bucket (top 6 bits) min/max bounds are taken over
    the INTERNAL post-rotation working coordinates (which go negative
    under the s-1-x reflections) — a value-check that pins the
    rotation state itself across engines, not the writer row-group
    stats of the original grid coordinates. Scale:
    pure map chain (whole-stage codegen, no Python) + one small hash
    agg; the quantization extents ride one broadcast scalar row."""
    li = load_table(spark, sf_dir, "lineitem")
    ext = li.agg(
        (F.max("l_partkey") + 1).alias("pmax"),
        (F.max("l_suppkey") + 1).alias("smax"),
    )
    cur = li.crossJoin(F.broadcast(ext)).selectExpr(
        "(l_partkey * 256) div pmax AS hx",
        "(l_suppkey * 256) div smax AS hy",
        "CAST(0 AS BIGINT) AS hd",
    )
    for i in range(_HILBERT_ORDER):
        lvl = _hilbert_level_sql(1 << (_HILBERT_ORDER - 1 - i))
        cur = cur.selectExpr(
            f"{lvl['hd']} AS hd",
            f"{lvl['hx']} AS hx",
            f"{lvl['hy']} AS hy",
        )
    return cur.groupBy(
        F.expr("hd >> 10").cast("bigint").alias("h_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("hx").alias("min_x"),
        F.max("hx").alias("max_x"),
        F.min("hy").alias("min_y"),
        F.max("hy").alias("max_y"),
    )


@register(
    "layout_compaction_plan",
    oracle="""
    WITH files AS (
        SELECT source, doc_id,
               CAST(length(text) AS BIGINT) AS sz
        FROM documents
    ), placed AS (
        SELECT source, doc_id, sz,
               SUM(sz) OVER (PARTITION BY source
                             ORDER BY sz DESC, doc_id) AS cum
        FROM files
    )
    SELECT source,
           CAST((cum - sz) // 2000 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(sz) AS BIGINT) AS bin_bytes,
           MAX(sz) AS max_file_bytes,
           MIN(doc_id) AS first_doc
    FROM placed
    GROUP BY 1, 2
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION planning — the lakehouse OPTIMIZE /
    bin-packing step every 100 TB table needs (thousands of tiny
    commit files → target-sized rewrite groups). Public algorithm:
    the streaming coalesce planner Spark itself uses for
    `spark.sql.files.maxPartitionBytes` (and Delta OPTIMIZE's
    bin-packing): within each partition, order files largest-first
    (FFD's sort step, deterministic doc_id tiebreak), take the
    running byte cumsum, and assign each file to the bin its STARTING
    offset falls in — ``(cum − size) // target``. Pure integer
    arithmetic end to end (sizes are BIGINT char counts, the bin id
    is exact integer division), so the plan is bit-identical
    cross-engine. Output: one row per (partition, bin) with file
    count, packed bytes and the largest member — exactly the rewrite
    manifest a compactor executes. Scale: one window cumsum per
    partition key + one hash agg — the planner never touches file
    CONTENTS, only the size column of the catalog listing, so it runs
    on a million-file table in seconds."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.length("text").cast("bigint").alias("sz")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("sz").desc(), F.col("doc_id")
    )
    placed = docs.select(
        "source", "doc_id", "sz", F.sum("sz").over(w).alias("cum")
    )
    return placed.groupBy(
        "source",
        # `div` = exact BIGINT floor division, matching the oracle's
        # integer `//` — IEEE double division would silently diverge
        # once cum-sz leaves double's 2^53 exact-integer range.
        F.expr("(cum - sz) div 2000").alias("bin"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("sz").alias("bin_bytes"),
        F.max("sz").alias("max_file_bytes"),
        F.min("doc_id").alias("first_doc"),
    )
