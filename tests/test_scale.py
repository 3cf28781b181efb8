"""Scale-technique tests (SURVEY §3.8 L6, §5): salting exactness under
planted skew, and bucketed co-located joins eliminating the shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricproxy_spark.operators.scale import salted_join, salted_sum_count


def test_salted_agg_exact_under_skew(spark):
    # one hot key carrying 5000 rows, two cold keys
    rows = [("hot", float(i % 7)) for i in range(5000)]
    rows += [("cold_a", 1.5), ("cold_b", 2.5)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        (r.k, r.n, round(r.sv, 4))
        for r in salted_sum_count(
            df, keys=["k"], sum_cols={"sv": "v"}, n_salt=16
        ).collect()
    }
    expected_hot_sum = round(sum(float(i % 7) for i in range(5000)), 4)
    assert got == {
        ("hot", 5000, expected_hot_sum),
        ("cold_a", 1, 1.5),
        ("cold_b", 1, 2.5),
    }


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(2000)], "k long, v double"
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (9, "unmatched")], "k long, name string"
    )
    salted = salted_join(fact, dim, key="k", n_salt=8)
    plain = fact.join(dim, "k", "inner")
    assert salted.count() == plain.count() == 2000
    a = salted.groupBy("k", "name").count().collect()
    b = plain.groupBy("k", "name").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates them at write
    time: the sort-merge join then needs NO Exchange — at 100 TB this
    is the difference between a full-fact shuffle and a map-side join.
    """
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    for name, df in (("t_bkt_left", left), ("t_bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bkt_left").join(
            spark.table("t_bkt_right"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for name in ("t_bkt_left", "t_bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
