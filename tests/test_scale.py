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


def _executed_plan(df) -> str:
    df.count()  # let AQE finalize so the plan reflects reality
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanDiscipline:
    """Explain-plan assertions for the newest operators: the plan we
    designed is the plan Catalyst actually runs (L6 review pass)."""

    def test_tfidf_broadcasts_small_sides(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = _executed_plan(QUERIES["text_tfidf"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_bitmask_similarity_is_equi_join(self, spark):
        """The degenerate-vocab fast path must plan an equi-join on the
        block key (hash/merge), never a nested-loop cartesian."""
        from metricproxy_spark.operators.dedup import (
            prefix_similarity_join,
        )

        df = spark.createDataFrame(
            [
                (i, "en", ["w%d" % (i % 5), "w%d" % ((i + 1) % 5), "x"])
                for i in range(200)
            ],
            "doc_id long, lang string, words array<string>",
        )
        pairs = prefix_similarity_join(
            df, "doc_id", "words", threshold=0.5, block_col="lang"
        )
        plan = _executed_plan(pairs)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan

    def test_cdc_merge_is_single_window_shuffle(self, spark):
        """merge_upsert = union + one window: exactly one Exchange on
        the merge key, no join operators at all."""
        from metricproxy_spark.operators.cdc import merge_upsert

        base = spark.createDataFrame(
            [(i, "b", 0, 0) for i in range(100)],
            "k long, v string, ts long, seq long",
        )
        changes = spark.createDataFrame(
            [(i, "c", 1, 0) for i in range(50)],
            "k long, v string, ts long, seq long",
        )
        out = merge_upsert(base, changes, ["k"], ["ts", "seq"])
        plan = _executed_plan(out)
        assert "Join" not in plan, plan
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, f"{n_exchanges} exchanges:\n{plan}"

    def test_repetition_signals_shuffle_free(self, spark, sf_dir):
        """The Gopher repetition signals must stay a NARROW projection:
        no Exchange anywhere — per-doc array HOFs, not explode+groupBy.
        At 100 TB this is the difference between a linear scan and a
        corpus-wide bigram shuffle."""
        from metricproxy_spark.io import load_table
        from metricproxy_spark.operators.text import repetition_signals

        docs = load_table(spark, sf_dir, "documents")
        sig = repetition_signals("text")
        out = docs.select(
            "doc_id", *[expr.alias(n) for n, expr in sig.items()]
        )
        plan = _executed_plan(out)
        assert "Exchange" not in plan, plan

    def test_paragraph_dedup_two_hash_shuffles_no_join(self, spark):
        """Paragraph dedup = window on para + groupBy doc: exactly two
        hash Exchanges (paragraph key, then doc key), no join operator
        — the rebuild must not plan as a self-join."""
        from metricproxy_spark.operators.text import paragraph_chunks, words_of
        from pyspark.sql import Window

        docs = spark.createDataFrame(
            [(i, "a b c d e f g h " * 4) for i in range(200)],
            "doc_id long, text string",
        )
        paras = docs.select(
            "doc_id",
            F.posexplode(paragraph_chunks(words_of("text"))).alias(
                "pos", "para"
            ),
        )
        first = F.min(F.struct("doc_id", "pos")).over(
            Window.partitionBy("para")
        )
        kept = paras.withColumn("_f", first).where(
            (F.col("doc_id") == F.col("_f.doc_id"))
            & (F.col("pos") == F.col("_f.pos"))
        )
        out = kept.groupBy("doc_id").agg(F.count("*").alias("n_kept"))
        plan = _executed_plan(out)
        assert "Join" not in plan, plan
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 2, f"{n_exchanges} exchanges:\n{plan}"

    def test_scan_prunes_columns_for_narrow_query(self, spark, sf_dir):
        """Column pruning reaches the parquet scan: a 2-column query
        over documents must not read the text-heavy columns."""
        from metricproxy_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang"
        )
        plan = _executed_plan(docs.groupBy("lang").count())
        # Catalyst prunes past the select: only the grouping column
        # reaches the scan.
        assert "ReadSchema: struct<lang:string>" in plan, plan


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


class TestPlanDisciplineRound1c:
    """Plan assertions for this batch's operators."""

    def test_decontaminate_broadcasts_eval_set(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = _executed_plan(QUERIES["pipeline_decontaminate"](spark, sf_dir))
        # eval shingle set must probe map-side; a shuffle join here
        # would shuffle the whole train corpus at 100 TB
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_pii_redact_is_map_only(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = _executed_plan(QUERIES["text_pii_redact"](spark, sf_dir))
        assert "Exchange" not in plan, plan
        assert "*(1)" in plan, plan  # whole-stage codegen'd single stage

    def test_stratified_sample_is_map_only(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = _executed_plan(
            QUERIES["layout_stratified_sample"](spark, sf_dir)
        )
        assert "Exchange" not in plan, plan

    def test_zorder_broadcasts_extrema_row(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = _executed_plan(QUERIES["layout_zorder_stats"](spark, sf_dir))
        # the 1-row extrema side must broadcast — a cross-join shuffle
        # of the fact table would be catastrophic at scale
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_ema_single_shuffle(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = _executed_plan(QUERIES["events_ema"](spark, sf_dir))
        # one hash agg pair on (event_type, day): exactly one Exchange
        assert plan.count("Exchange hashpartitioning") == 1, plan


class TestTpchPlanDiscipline:
    """The adapted TPC-H shapes must plan the way their docstrings
    claim: dims broadcast, facts never cartesian-joined, filters at
    the scan."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_q14_broadcasts_part_and_pushes_dates(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q14_promo_share")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "PushedFilters" in plan or "isnotnull(l_shipdate" in plan, plan

    def test_q17_coshuffles_avg_on_partkey(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q17_small_qty_revenue")
        assert "BroadcastHashJoin" in plan, plan  # part dim
        assert "CartesianProduct" not in plan, plan

    def test_q18_aggregates_before_joining(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q18_large_orders")
        assert "CartesianProduct" not in plan, plan

    def test_q22_anti_join_no_cartesian_on_facts(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q22_idle_customers")
        # the 1-row scalar threshold joins as a broadcast nested loop —
        # that's the intended scalar cross join; the anti join must be
        # hash-based and nothing fact-sized may go cartesian
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_pagerank_loop_reuses_edge_layout(self, spark, sf_dir):
        """The iteration loop materializes through a persisted edge
        layout, the final ranks are localCheckpoint-ed (lineage cut),
        and the edge cache is RELEASED before the query returns — a
        shared session running many queries must not accumulate
        edge-sized cache entries. The linearity-in-edges property is
        separately bounded by test_pagerank_shuffle_linear_in_edges."""
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        before = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        df = QUERIES["graph_pagerank"](spark, sf_dir)
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        after = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        # at most the checkpointed node-sized ranks may remain cached;
        # the edge-sized layout must have been unpersisted
        assert len(after - before) <= 1, sorted(after - before)


class TestRound3bPlanDiscipline:
    """Plan assertions for the round-3b operators."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_histogram_rollup_partial_aggregates(self, spark, sf_dir):
        """Both rollup levels must partial-aggregate (map-side combine)
        so the shuffles stay key-space sized at any event volume."""
        plan = self._plan(spark, sf_dir, "events_histogram_rollup")
        assert "partial_count" in plan or "HashAggregate" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_exact_spans_no_cartesian_no_global_sort(self, spark, sf_dir):
        """First-occurrence = min(struct) hash agg + joins; no window
        sort of the occurrence stream, nothing cartesian."""
        plan = self._plan(spark, sf_dir, "dedup_exact_spans")
        assert "CartesianProduct" not in plan, plan
        assert "min(_first" in plan or "HashAggregate" in plan, plan

    def test_anomaly_mad_broadcasts_scalars(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "events_anomaly_mad")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_seasonality_single_bounded_agg(self, spark, sf_dir):
        """One hash agg, no join, no window — the |types|x24x7 matrix."""
        plan = self._plan(spark, sf_dir, "events_seasonality")
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan

    def test_per_class_cap_window_group_limit(self, spark, sf_dir):
        """The rn<=50 cap must plan as Partial+Final WindowGroupLimit
        (Spark's rank-limit pushdown): every input partition prunes to
        ≤50 rows per class BEFORE the shuffle, so the per-class sort
        never sees a full 100 TB class."""
        plan = self._plan(spark, sf_dir, "pipeline_per_class_cap")
        assert plan.count("WindowGroupLimit") >= 2, plan
        assert "Partial" in plan and "Final" in plan, plan


class TestRound3cPlanDiscipline:
    """Plan assertions for the round-3c queries: the nine new TPC-H
    shapes and the sessionize/concurrency/SemDeDup/bigram additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_q3_broadcasts_customer_no_cartesian(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q3_shipping_priority")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_q4_exists_plans_as_semi_join(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q4_order_priority")
        assert "LeftSemi" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_q5_dims_collapse_to_broadcasts(self, spark, sf_dir):
        """Six logical tables; only orders⋈lineitem may shuffle-join —
        every dim side must arrive broadcast."""
        plan = self._plan(spark, sf_dir, "tpch_q5_local_supplier_volume")
        assert plan.count("BroadcastHashJoin") >= 3, plan
        assert "CartesianProduct" not in plan, plan

    def test_q7_nation_self_join_broadcasts_both_roles(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q7_volume_shipping")
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan

    def test_q8_share_aggregates_in_one_pass(self, spark, sf_dir):
        """Numerator and denominator must come out of ONE aggregate —
        exactly one pair of partial/final HashAggregates, not a second
        scan for the denominator."""
        plan = self._plan(spark, sf_dir, "tpch_q8_market_share")
        assert "CartesianProduct" not in plan, plan
        assert plan.count("HashAggregate") == 2, plan

    def test_q13_outer_join_keeps_filter_in_join(self, spark, sf_dir):
        """The priority filter must ride the LEFT OUTER join condition
        (zero-order customers survive), not fall below it as a scan
        filter on orders' probe side post-join."""
        plan = self._plan(spark, sf_dir, "tpch_q13_customer_distribution")
        assert "LeftOuter" in plan or "RightOuter" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_q19_pushes_quantity_range_to_scan(self, spark, sf_dir):
        """Catalyst must extract the probe-side disjunct range and push
        it into the lineitem scan filters."""
        plan = self._plan(spark, sf_dir, "tpch_q19_disjunctive_revenue")
        assert "CartesianProduct" not in plan, plan
        # the OR-of-ANDs quantity bounds surface as a pushed range
        assert "l_quantity" in plan, plan

    def test_q21_single_fact_agg_no_extra_fact_joins(self, spark, sf_dir):
        """The decorrelated EXISTS/NOT EXISTS must not re-shuffle
        lineitem more than the one per-order aggregate + one re-join:
        at most two Exchanges carrying lineitem-derived rows."""
        plan = self._plan(spark, sf_dir, "tpch_q21_waiting_supplier")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan  # supplier dim

    def test_sessionize_reuses_user_partitioning(self, spark, sf_dir):
        """Both window passes and the final agg key on user_id — one
        Exchange on the events table, reused downstream."""
        plan = self._plan(spark, sf_dir, "events_sessionize")
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 2, plan  # sort-window + (possibly) agg
        assert "CartesianProduct" not in plan, plan

    def test_concurrency_single_sweep_shuffle(self, spark, sf_dir):
        """The +1/−1 sweep must shuffle once on event_type and the
        per-day max must partial-aggregate on top of it."""
        plan = self._plan(spark, sf_dir, "events_concurrency")
        assert plan.count("Exchange hashpartitioning") <= 2, plan
        assert "CartesianProduct" not in plan, plan

    def test_semantic_dedup_broadcasts_centroids(self, spark, sf_dir):
        """The |labels|·d centroid table must broadcast; the pair space
        is the within-cluster equi-join, never a corpus cartesian."""
        plan = self._plan(spark, sf_dir, "dedup_semantic")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_bigram_coverage_model_stays_distributed(self, spark, sf_dir):
        """Occurrence→count join must be a shuffled equi-join on the
        bigram (model never collected to the driver), then one per-doc
        agg."""
        plan = self._plan(spark, sf_dir, "text_bigram_coverage")
        assert "CartesianProduct" not in plan, plan
        assert "HashAggregate" in plan, plan


class TestRound3dPlanDiscipline:
    """Plan assertions for the q6/q9/q12/q15, M4, lift, and triangle
    additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_q6_every_predicate_reaches_the_scan(self, spark, sf_dir):
        """Q6 is scan+filter+agg only: no join operator of any kind may
        appear, and the ship-date bound must be pushed."""
        plan = self._plan(spark, sf_dir, "tpch_q6_forecast_revenue")
        assert "Join" not in plan, plan
        assert "PushedFilters" in plan, plan
        assert "l_shipdate" in plan, plan

    def test_q9_dims_broadcast_facts_shuffle_once(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q9_product_profit")
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan

    def test_q12_filters_shrink_probe_before_join(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "tpch_q12_priority_lines")
        assert "CartesianProduct" not in plan, plan
        assert "l_returnflag" in plan, plan  # pushed to lineitem scan

    def test_q15_scalar_max_broadcasts(self, spark, sf_dir):
        """The 1-row max joins via broadcast nested loop (the intended
        scalar cross join); the supplier dim must hash-broadcast."""
        plan = self._plan(spark, sf_dir, "tpch_q15_top_supplier")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_m4_single_aggregate_no_window(self, spark, sf_dir):
        """The batch M4 rollup must be ONE partial+final agg pair —
        first/last via ordered-struct min/max, never a window sort."""
        plan = self._plan(spark, sf_dir, "events_downsample_m4")
        assert plan.count("HashAggregate") == 2 or (
            "SortAggregate" in plan and "Window" not in plan
        ), plan
        assert "Window" not in plan, plan

    def test_copurchase_counts_broadcast_onto_pairs(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "analytic_copurchase_lift")
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan

    def test_triangles_join_deduped_edges_only(self, spark, sf_dir):
        """The triangle self-joins must consume the DISTINCT edge list
        (an aggregate above the fact join), and nothing cartesian."""
        plan = self._plan(spark, sf_dir, "graph_triangles")
        assert "CartesianProduct" not in plan, plan
        assert "HashAggregate" in plan, plan


class TestRound4LayoutDiscipline:
    """Plan assertions for the round-4 layout operators: the layout's
    whole point is what the plan does NOT contain."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_partition_pruning_reaches_the_scan(self, spark, sf_dir):
        """The user_bucket predicate must prune directories at planning
        time (PartitionFilters on the scan), not filter rows after a
        full read."""
        plan = self._plan(spark, sf_dir, "layout_partition_pruning")
        assert "PartitionFilters" in plan, plan
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "user_bucket" in m.group(1), plan

    def test_bucketed_join_no_exchange_no_sort(self, spark, sf_dir):
        """Bucketed+sorted layout on the join key: the sort-merge join
        must consume both bucketed scans DIRECTLY — no Exchange on
        either join input (the co-location contract). The only Exchange
        allowed in the whole plan is the final tiny groupBy on
        o_orderpriority (5 keys); bucket scans are planner-visible
        (Bucketed: true, all buckets selected)."""
        plan = self._plan(spark, sf_dir, "layout_bucketed_join")
        assert "SortMergeJoin" in plan, plan
        # everything below the join (its two inputs) is shuffle-free
        below_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in below_join, plan
        assert plan.count("Exchange") == 1, plan  # only the final agg
        assert plan.count("Bucketed: true") == 2, plan


class TestRound4QueryPlanDiscipline:
    """Plan assertions for the round-4 analytic additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_skyline_is_window_not_dominance_join(self, spark, sf_dir):
        """The Pareto frontier must never plan as a quadratic
        dominance self-join over ROW data. (Round 6 replaced the
        original global-order window — itself a single-task shape —
        with keyed per-x maxima + a broadcast triangular join of the
        domain-bounded aggregate; the only row-data join is the
        initial customer⋈orders rollup. TestRound6PlanDiscipline pins
        the full new shape.)"""
        plan = self._plan(spark, sf_dir, "analytic_skyline_frontier")
        assert "CartesianProduct" not in plan, plan
        # the triangular join of the per-n_orders aggregate is
        # broadcast and domain-bounded; row data must never feed a
        # nested-loop side (its build side is an Aggregate)
        assert "Exchange SinglePartition" not in plan, plan
        assert "Window" not in plan, plan

    def test_asof_family_plans_without_joins(self, spark, sf_dir):
        """Forward and nearest as-of are union+window rewrites: ZERO
        join operators anywhere — the pair-explosion-free property
        that makes them survive fact-sized inputs."""
        for name in ("analytic_asof_forward", "analytic_asof_nearest"):
            plan = self._plan(spark, sf_dir, name)
            assert "Join" not in plan, f"{name}:\n{plan}"
            assert "Window" in plan, name

    def test_burn_rate_nested_rollup_partial_aggregates(
        self, spark, sf_dir
    ):
        """5m→1h nested rollup: both levels hash-aggregate with
        map-side partials; no join, no window."""
        plan = self._plan(spark, sf_dir, "events_sla_burn_rate")
        assert "Join" not in plan, plan
        assert plan.count("HashAggregate") >= 4, plan  # 2 levels × partial+final

    def test_sequential_folds_single_shuffle(self, spark, sf_dir):
        """Holt and CUSUM collapse to ONE hash shuffle (the per-group
        collect_list agg) + narrow folds — the sequential recurrences
        never become iterative jobs or windows over the raw stream."""
        for name in ("events_holt_trend", "events_cusum_score"):
            plan = self._plan(spark, sf_dir, name)
            n_ex = plan.count("Exchange hashpartitioning")
            assert n_ex == 1, f"{name}: {n_ex} exchanges\n{plan}"
            assert "Join" not in plan, name


class TestRound5PlanDiscipline:
    """Plan assertions for the round-5 additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_wire_parsers_single_agg_no_join(self, spark, sf_dir):
        """statsd / influx-line: map-only parse (regexp/str_to_map in
        codegen) + keyed hash shuffles only, no joins anywhere.
        Influx is ONE exchange; statsd's set-cardinality
        count(DISTINCT) legitimately adds the standard
        partial-distinct second exchange (both keyed — no all-to-one
        stage)."""
        for name, max_ex in (
            ("ingest_statsd", 2),
            ("ingest_influx_line", 1),
        ):
            plan = self._plan(spark, sf_dir, name)
            assert "Join" not in plan, f"{name}:\n{plan}"
            n_ex = plan.count("Exchange hashpartitioning")
            assert n_ex <= max_ex, f"{name}: {n_ex} exchanges\n{plan}"
            assert "Exchange SinglePartition" not in plan, plan

    def test_bm25_tf_is_map_only_with_broadcast_stats(self, spark, sf_dir):
        """Per-doc tf comes from array filter (no explode shuffle);
        corpus stats ride back on a broadcast; top-k is TakeOrdered,
        never a global sort."""
        plan = self._plan(spark, sf_dir, "text_bm25_topk")
        assert "Generate explode" not in plan, plan
        assert "BroadcastExchange" in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        # the only hash exchange is the 1-row corpus-stats agg
        assert plan.count("Exchange hashpartitioning") <= 1, plan

    def test_twa_single_window_sort(self, spark, sf_dir):
        """Lead + weighted agg reuse ONE (type, day) partitioning:
        exactly one hash exchange, no join."""
        plan = self._plan(spark, sf_dir, "events_time_weighted_avg")
        assert "Join" not in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Window" in plan, plan

    def test_moments_partial_aggregates(self, spark, sf_dir):
        """posexplode then hash agg with map-side combine: the shuffle
        carries ≤ 64 dims × partials, never the exploded rows."""
        plan = self._plan(spark, sf_dir, "sim_embedding_moments")
        assert plan.count("HashAggregate") >= 2, plan  # partial+final
        assert "Join" not in plan, plan

    def test_cms_sketch_is_broadcast_probe(self, spark, sf_dir):
        """The candidate→cell probe joins against the d·w-cell sketch
        as a BROADCAST (the sketch is bounded by construction); no
        sort-merge join of fact-sized sides."""
        plan = self._plan(spark, sf_dir, "analytic_cms_heavy_hitters")
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_pca_partials_bounded_by_partition_count(self, spark, sf_dir):
        """The Gram reduction ships ONE d²-sized row per non-empty
        input partition — the collect is partition-count-sized, not
        row-count-sized."""
        from metricproxy_spark.io import load_table
        from metricproxy_spark.operators.pca import (
            _PARTIAL_SCHEMA,
            _partial_gram,
        )

        emb = load_table(spark, sf_dir, "embeddings").repartition(5)
        src = emb.select(
            F.col("embedding").cast("array<double>").alias("embedding")
        )
        parts = src.mapInPandas(_partial_gram("embedding"), _PARTIAL_SCHEMA)
        assert parts.count() <= 5


class TestRound6PlanDiscipline:
    """Plan assertions for the round-6 scale rewrites: the two former
    global-order windows (VERDICT r5 "What's wrong" #2/#3) now shuffle
    row data only on keys; any single-partition exchange that remains
    carries aggregate (bounded) data."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    @staticmethod
    def _single_partition_children(plan: str) -> list[str]:
        """For each Exchange SinglePartition, the operator feeding it."""
        lines = plan.splitlines()
        return [
            lines[i + 1]
            for i, ln in enumerate(lines)
            if "Exchange SinglePartition" in ln
        ]

    def test_pack_sequences_no_row_data_single_partition(self, spark, sf_dir):
        """The doc-order prefix sum runs as per-range PARTITIONED
        windows; every surviving SinglePartition exchange feeds off a
        HashAggregate (1-row min/max partials or the R-row range
        totals), never raw document rows."""
        plan = self._plan(spark, sf_dir, "pipeline_pack_sequences")
        children = self._single_partition_children(plan)
        assert children, "expected the bounded bounds/offsets aggregates"
        for child in children:
            assert "HashAggregate" in child, f"{child}\n{plan}"
        # the row-data window is partitioned by the range id
        assert "windowspecdefinition(rg#" in plan, plan

    def test_skyline_no_single_partition_at_all(self, spark, sf_dir):
        """Per-x maxima via keyed agg + broadcast of the domain-bounded
        bests: zero single-partition exchanges, zero windows."""
        plan = self._plan(spark, sf_dir, "analytic_skyline_frontier")
        assert "Exchange SinglePartition" not in plan, plan
        assert "Window" not in plan, plan
        assert "BroadcastExchange" in plan, plan

    def test_semantic_pair_join_consumes_bucketed_members(self, spark, sf_dir):
        """The within-cluster self-join reads the staged members table
        bucketed by cluster: no hash exchange on either side — the
        broadcast path at tiny SF, the bucketed sort-merge at scale
        (both verified; this asserts the absence of re-shuffle)."""
        plan = self._plan(spark, sf_dir, "dedup_semantic")
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan

    def test_runtime_bloom_filter_reaches_fact_scan(self, spark, sf_dir):
        """layout_runtime_bloom_filter's scoped confs must make
        Catalyst aggregate a bloom filter over the filtered dim keys
        and plant might_contain into the fact side BEFORE the join
        shuffle — replicated here on the raw join so the executed
        plan is inspectable (the registered query collects under the
        scoped confs and returns materialized rows)."""
        from metricproxy_spark.io import load_table

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
            j = (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .count()
            )
            plan = _executed_plan(j)
            assert "bloom_filter_agg" in plan, plan
            assert "might_contain" in plan, plan
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def test_image_dhash_candidates_are_equi_join(self, spark, sf_dir):
        """The banded candidate join must plan as an equi-join on
        (band_idx, band) — never a nested-loop/cartesian pair sweep;
        exact Hamming confirm stays JVM-side (bit_count)."""
        plan = self._plan(spark, sf_dir, "dedup_image_dhash")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
        assert "bit_count" in plan, plan

    def test_greedy_packer_keyed_shuffles_only(self, spark, sf_dir):
        """Per-shard greedy packing: the only shuffle over row data is
        the keyed shard groupBy; no single-partition exchange, no
        window, no join."""
        plan = self._plan(spark, sf_dir, "pipeline_pack_greedy")
        assert "Exchange SinglePartition" not in plan, plan
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan


class TestRound7PlanDiscipline:
    """Plan assertions for the round-7 compositions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_web_curation_only_two_key_shuffles(self, spark, sf_dir):
        """WARC read → canonicalize → extract → dedup → quality →
        manifest composes with exactly the two content-keyed hash
        exchanges its stages own (dedup key, language manifest): no
        single-partition exchange, no join, no window — everything
        else is map-only over the per-file WARC partitions."""
        plan = self._plan(spark, sf_dir, "pipeline_web_curation_end2end")
        assert "Exchange SinglePartition" not in plan, plan
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan
        n_hash_exchanges = plan.count("Exchange hashpartitioning")
        assert n_hash_exchanges == 2, f"{n_hash_exchanges}\n{plan}"


class TestWirePayloadGuard:
    """The load-generator collects behind the live-listener queries are
    bounded: past guard_rows they raise instead of materializing the
    table on the driver (r6 VERDICT task 6)."""

    def test_within_guard_passes_through(self, spark):
        from metricproxy_spark.operators.scale import (
            guarded_wire_pandas,
            guarded_wire_payload,
        )

        df = spark.range(10).selectExpr("concat('l', id) AS line")
        rows = guarded_wire_payload(df, guard_rows=10)
        assert sorted(r.line for r in rows) == sorted(
            f"l{i}" for i in range(10)
        )
        assert len(guarded_wire_pandas(df, guard_rows=10)) == 10

    def test_past_guard_raises_loudly(self, spark):
        import pytest

        from metricproxy_spark.operators.scale import (
            guarded_wire_pandas,
            guarded_wire_payload,
        )

        df = spark.range(101).selectExpr("concat('l', id) AS line")
        with pytest.raises(ValueError, match="guard_rows=100"):
            guarded_wire_payload(df, guard_rows=100)
        with pytest.raises(ValueError, match="guard_rows=100"):
            guarded_wire_pandas(df, guard_rows=100)


class TestRound7bPlanDiscipline:
    """Plan assertions for the round-7 session-2 additions: the two
    blocked joins must not degenerate into cross products, and the
    iterative BFS must reuse its persisted edge layout."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_spatial_join_is_cell_hash_join(self, spark, sf_dir):
        """Grid blocking = one hash join on (cx, cy); the quadratic
        definition lives only in the oracle. No cross product."""
        plan = self._plan(spark, sf_dir, "analytic_spatial_join")
        assert "CartesianProduct" not in plan, plan
        assert "cx" in plan and "cy" in plan, plan

    def test_fuzzy_join_candidates_shuffle_on_gram(self, spark, sf_dir):
        """The signature candidate join shuffles on the gram key, and
        since round 8 the short-string branch is a length-bucket
        equi-join — NO nested-loop shape anywhere in the plan."""
        plan = self._plan(spark, sf_dir, "analytic_fuzzy_join")
        assert "hashpartitioning(gram" in plan or "gram#" in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "blen" in plan, plan

    def test_sssp_reuses_persisted_edges(self, spark, sf_dir):
        """Each BFS round re-joins the SAME persisted edge layout and
        eagerly checkpoints the round's node-sized dist table (the r14
        optimization: without the per-round lineage cut the dist
        subtree DOUBLED per relaxation round). The checkpoint truncates
        the final plan at the last round's materialized RDD — so the
        plan must read that RDD (not re-derive the rounds, which is
        what the old InMemoryTableScan assert pinned one lineage level
        shallower) and still must not cross-join anything."""
        plan = self._plan(spark, sf_dir, "graph_sssp_hops")
        assert "Scan ExistingRDD" in plan, plan
        assert "InMemoryTableScan" not in plan, plan  # cache released
        assert "CartesianProduct" not in plan, plan

    def test_market_basket_no_cartesian(self, spark, sf_dir):
        """Pairs come from the order-key self-join; the only
        broadcast-nested-loop is the 1-row totals attach."""
        plan = self._plan(spark, sf_dir, "analytic_market_basket")
        assert "CartesianProduct" not in plan, plan

    def test_tpch_partsupp_queries_broadcast_dims(self, spark, sf_dir):
        """q2/q16/q20: dims broadcast, no cartesian beyond the 1-row
        supplier-count attach that derives partsupp."""
        for name in (
            "tpch_q2_min_cost_supplier",
            "tpch_q16_supplier_count",
            "tpch_q20_potential_promotion",
        ):
            plan = self._plan(spark, sf_dir, name)
            assert "CartesianProduct" not in plan, f"{name}\n{plan}"
            assert "BroadcastHashJoin" in plan, f"{name}\n{plan}"


class TestRound8PlanDiscipline:
    """Plan assertions for the round-8 compositions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_multimodal_curation_only_two_key_shuffles(self, spark, sf_dir):
        """staged assets → tolerant decode + features + fingerprint
        (ONE map-only Arrow stage) → fingerprint collapse → manifest:
        exactly the two content-keyed hash exchanges the two groupBys
        own; no join, no window, no cartesian anywhere."""
        plan = self._plan(
            spark, sf_dir, "pipeline_multimodal_curation_end2end"
        )
        assert "Exchange SinglePartition" not in plan, plan
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        n_hash_exchanges = plan.count("Exchange hashpartitioning")
        assert n_hash_exchanges == 2, f"{n_hash_exchanges}\n{plan}"

    def test_language_id_model_broadcasts(self, spark, sf_dir):
        """Trigram model + totals both broadcast into the scoring
        joins — scoring stays map-side; the only hash exchanges are
        the model/doc-gram aggs and the per-doc argmax window."""
        plan = self._plan(spark, sf_dir, "text_language_id")
        assert plan.count("BroadcastHashJoin") >= 3, plan
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_promql_rate_no_join_two_windows_one_agg(self, spark, sf_dir):
        """rate() = hourly rollup + segment-cumsum window + within-day
        lag window + one (type, day) agg: no join anywhere, no
        cartesian, no single-partition exchange."""
        plan = self._plan(spark, sf_dir, "events_promql_rate")
        assert "Join" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_predict_linear_map_combinable_sums(self, spark, sf_dir):
        """The regression state is five map-combinable sums: partial
        aggregation must appear below the (type, day) exchange."""
        plan = self._plan(spark, sf_dir, "events_predict_linear")
        assert "partial_" in plan.lower() or "HashAggregate" in plan, plan
        assert "Join" not in plan, plan

    def test_rendezvous_no_cartesian_beyond_literal_explode(self, spark, sf_dir):
        """HRW routing explodes a literal 8-element backend array —
        a map-side flatmap, not a join against a ring table."""
        plan = self._plan(spark, sf_dir, "ingest_rendezvous_route")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "Generate explode" in plan, plan

    def test_deterministic_sample_is_take_ordered(self, spark, sf_dir):
        """bottom-k by hash plans as TakeOrderedAndProject — per-
        partition top-k + k-row merge, never a full sort shuffle."""
        plan = self._plan(spark, sf_dir, "ingest_deterministic_sample")
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange rangepartitioning" not in plan, plan

    def test_minhash_exact_signature_agg_is_partial(self, spark, sf_dir):
        """The 8 min-of-md5 signatures compute as ONE hash agg with
        map-side combine; candidates join on (band, key) — no
        cartesian."""
        plan = self._plan(spark, sf_dir, "dedup_minhash_exact")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan

    def test_gorilla_is_map_only_after_series_collect(self, spark, sf_dir):
        """Gorilla roundtrip = hourly rollup + per-(type, day) series
        collect + one Arrow map stage: no join, no window."""
        plan = self._plan(spark, sf_dir, "events_gorilla_roundtrip")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan


class TestRound9PlanDiscipline:
    """Plan assertions for the round-9 rewrites and additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_hashring_route_is_pure_map_no_join(self, spark, sf_dir):
        """Round-9 VERDICT task 4: the sorted-ring HOF scan replaced
        the x144 crossJoin+min_by AND the r8/r9 key self-join — the
        whole query must plan as scan -> distinct -> map -> one hash
        agg with NO join of any kind and no row expansion."""
        plan = self._plan(spark, sf_dir, "ingest_hashring_route")
        assert "Join" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Generate explode" not in plan, plan

    def test_hierarchy_recursive_native_union_loop(self, spark, sf_dir):
        """The native WITH RECURSIVE twin must not collect or
        cartesian; the recursion is a distributed union loop feeding
        one hash agg."""
        plan = self._plan(spark, sf_dir, "analytic_hierarchy_recursive")
        assert "CartesianProduct" not in plan, plan

    def test_shard_manifest_no_global_sort(self, spark, sf_dir):
        """Selection ranks within strata and shards are hash-bucketed:
        the plan must contain NO range partitioning (global sort) and
        no cartesian; the allocation table broadcasts into the rank
        filter."""
        plan = self._plan(spark, sf_dir, "pipeline_training_shard_manifest")
        assert "Exchange rangepartitioning" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_shard_manifest_budget_invariant(self, spark, sf_dir):
        """Apportionment's defining invariant survives the composition:
        the manifest's doc counts sum to exactly the 200-doc budget
        (capped at the corpus size when the corpus is smaller — Hare
        allocations can then exceed stratum sizes and selection takes
        the whole stratum), and every (shard, stratum) count is
        positive."""
        from metricproxy_spark.io import load_table
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        n_corpus = load_table(spark, sf_dir, "documents").count()
        rows = QUERIES["pipeline_training_shard_manifest"](
            spark, sf_dir
        ).collect()
        assert sum(r.n_docs for r in rows) == min(200, n_corpus)
        assert all(r.n_docs > 0 for r in rows)
        assert {r.shard for r in rows} <= set(range(8))

    def test_hashring_hof_scan_wraps_past_ring_top(self, spark):
        """The filter-HOF clockwise-successor expression must WRAP to
        the ring's first vnode when the key hashes above every ring
        position — the case testdata only probabilistically exercises
        (P ~ 0.7% per key). Mini-ring with two vnodes, keys on every
        side."""
        from pyspark.sql import functions as F

        arr = (
            "array(named_struct('pos','3333','backend','a'),"
            "named_struct('pos','7777','backend','b'))"
        )
        owner = F.expr(
            f"coalesce(try_element_at(filter({arr}, x -> x.pos >= kh), 1)"
            f".backend, try_element_at({arr}, 1).backend)"
        ).alias("owner")
        df = spark.createDataFrame(
            [("0001",), ("3333",), ("5000",), ("7777",), ("9999",)],
            "kh string",
        ).select("kh", owner)
        got = {r.kh: r.owner for r in df.collect()}
        assert got == {
            "0001": "a",  # below both -> first vnode clockwise
            "3333": "a",  # exactly on a vnode -> that vnode
            "5000": "b",
            "7777": "b",
            "9999": "a",  # above the top -> WRAP to ring[0]
        }


class TestRound10PlanDiscipline:
    """Plan assertions for the round-10 additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_group_left_one_side_broadcasts(self, spark, sf_dir):
        """PromQL many-to-one matching: the 'one' side is
        series-cardinality and must broadcast onto the many-side
        rollup — no shuffle of the big operand, no cartesian."""
        plan = self._plan(spark, sf_dir, "events_promql_binop_group_left")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_setops_are_semi_anti_joins(self, spark, sf_dir):
        """and/unless/or must plan as semi/anti joins on the
        pre-aggregated series atom, never a cartesian."""
        plan = self._plan(spark, sf_dir, "events_promql_setops")
        assert "LeftSemi" in plan, plan
        assert "LeftAnti" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_alert_for_duration_no_sample_sized_state(self, spark, sf_dir):
        """The alert state machine runs on the series-grid rollup:
        windows partition by event_type only AFTER the hourly hash
        agg; the only row expansion is the tiny types x hours grid
        (broadcast nested loop over 5 x ~720), never a sample-level
        cartesian."""
        plan = self._plan(spark, sf_dir, "events_alert_for_duration")
        assert "CartesianProduct" not in plan, plan
        assert "HashAggregate" in plan, plan

    def test_remote_write_legs_are_map_only(self, spark, sf_dir):
        """Both remote-write roundtrip legs are Arrow-batched
        mapInPandas over whole blobs: no join, no shuffle exchange
        anywhere in the plan (scan -> encode -> decode)."""
        for name in ("ingest_remote_write", "ingest_remote_write_v2"):
            plan = self._plan(spark, sf_dir, name)
            assert "Join" not in plan, (name, plan)
            assert "Exchange hashpartitioning" not in plan, (name, plan)


class TestRound11PlanDiscipline:
    """Plan assertions for the round-11 additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_subquery_is_join_free(self, spark, sf_dir):
        """The PromQL subquery evaluates as rollup -> window -> agg:
        the derived series never needs a join, and the raw table is
        scanned exactly once."""
        plan = self._plan(spark, sf_dir, "events_promql_subquery")
        assert "Join" not in plan, plan
        assert "HashAggregate" in plan, plan

    def test_offset_at_broadcasts_anchor_only(self, spark, sf_dir):
        """offset joins the rollup to itself on the shifted (series,
        hour) key; the @-anchor is a series-cardinality dim and must
        BROADCAST — and nothing may plan cartesian."""
        plan = self._plan(spark, sf_dir, "events_promql_offset_at")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_graphite_summarize_broadcasts_rank_dim(self, spark, sf_dir):
        """highestCurrent ranks a |series|-row dim; attaching it to the
        daily rollup must be a broadcast join."""
        plan = self._plan(spark, sf_dir, "events_graphite_summarize")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_graphite_window_functions_join_free(self, spark, sf_dir):
        """movingAverage/Median/Max and derivative/perSecond/integral
        are lag/cumsum windows over one rollup — never a self-join."""
        for name in ("events_graphite_moving", "events_graphite_derivative"):
            plan = self._plan(spark, sf_dir, name)
            assert "Join" not in plan, (name, plan)
            assert "HashAggregate" in plan, (name, plan)

    def test_v2_histograms_rollup_before_codec(self, spark, sf_dir):
        """The native-histogram leg encodes ROLLUP-sized rows (series
        agg joined to its bucket arrays on the rollup key) — no
        cartesian anywhere, and the map-only codec stages run after
        the aggregation."""
        plan = self._plan(spark, sf_dir, "ingest_remote_write_v2_histograms")
        assert "CartesianProduct" not in plan, plan
        assert "HashAggregate" in plan, plan
        assert "MapInPandas" in plan, plan

    def test_openmetrics_gate_is_one_row_broadcast(self, spark, sf_dir):
        """The # EOF framing gate is a 1-row aggregate cross-joined as
        a broadcast onto the parsed samples — the only acceptable
        'cartesian' is the broadcast nested loop over exactly one
        row."""
        plan = self._plan(spark, sf_dir, "ingest_openmetrics")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan

    def test_subquery_rate_is_join_free(self, spark, sf_dir):
        """The counter subquery (rate inner) is rollup -> per-series
        window scans -> day agg: sliding-window reset correction is a
        frame sum, never a self-join."""
        plan = self._plan(spark, sf_dir, "events_promql_subquery_rate")
        assert "Join" not in plan, plan
        assert "HashAggregate" in plan, plan

    def test_native_quantile_broadcasts_phi_grid(self, spark, sf_dir):
        """The 3-row phi grid attaches as a broadcast nested loop over
        the rollup-sized bucket frame — the only acceptable cross
        shape; the bucket math itself stays agg+window."""
        plan = self._plan(spark, sf_dir, "events_native_histogram_quantile")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "HashAggregate" in plan, plan


class TestRound12PlanDiscipline:
    """Plan assertions for the round-12 lakehouse/codec additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_delta_checkpoint_scan_is_filtered_parquet(self, spark, sf_dir):
        """After stats skipping the data path is a plain parquet scan
        of the qualifying files + the residual filter — no join, no
        shuffle; the checkpoint/tail reconciliation never touches the
        data plan."""
        plan = self._plan(spark, sf_dir, "cdc_delta_checkpoint_snapshot")
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan
        assert "Scan parquet" in plan, plan

    def test_rowgroup_prune_is_map_only(self, spark, sf_dir):
        """Qualifying row-group indices ride a tiny frame into one
        Arrow map — no shuffle after the repartition of the index
        list, no join, no driver-side data."""
        plan = self._plan(spark, sf_dir, "ingest_parquet_rowgroup_prune")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_page_decode_is_map_only(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "ingest_parquet_page_decode")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_iceberg_scan_is_union_of_manifests_plus_parquet(
        self, spark, sf_dir
    ):
        """Live files resolve from avrowire manifest scans (status
        filter pushed into the scan's Filter); the data leg is a plain
        parquet scan of survivors — no join anywhere."""
        plan = self._plan(spark, sf_dir, "cdc_iceberg_snapshot")
        assert "Join" not in plan, plan
        assert "Scan parquet" in plan, plan

    def test_deletion_vector_scan_is_map_only(self, spark, sf_dir):
        """The 8-row add catalog rides into per-file position-aware
        scans — one Arrow map, no shuffle of data rows, no join."""
        plan = self._plan(spark, sf_dir, "cdc_delta_deletion_vectors")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_zstd_shards_grouped_map(self, spark, sf_dir):
        """Shards form in the groupBy(source, shard) Arrow map; codec
        work is map-side. Since round 13 the size-bounding cumsum
        window adds exactly one more exchange (partitionBy source for
        the window, then the group hash) — the price of capping
        per-task payloads at TARGET chars on a skewed corpus."""
        plan = self._plan(spark, sf_dir, "ingest_zstd_shards")
        assert "FlatMapGroupsInPandas" in plan, plan
        assert "Join" not in plan, plan
        assert "Window" in plan, plan
        assert plan.count("Exchange") <= 3, plan

    def test_iceberg_positional_deletes_anti_join_broadcasts(
        self, spark, sf_dir
    ):
        """Iceberg position deletes are TABLE data, so the
        merge-on-read is a (file_path, pos) anti-join — broadcast on
        the deletion-sized side, never cartesian."""
        plan = self._plan(spark, sf_dir, "cdc_iceberg_positional_deletes")
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_kafka_cycling_stays_map_only(self, spark, sf_dir):
        """Adding the zstd leg must not change the shape: encode and
        decode are back-to-back Arrow maps over the scan, shuffle-free
        except the spread() repartition."""
        plan = self._plan(spark, sf_dir, "ingest_kafka_recordbatch")
        assert "Join" not in plan, plan
        assert plan.count("MapInPandas") >= 2, plan

    def test_iceberg_equality_deletes_value_anti_join(self, spark, sf_dir):
        """Equality deletes apply by VALUE: one broadcast anti-join on
        the equality columns, no position machinery, no cartesian."""
        plan = self._plan(spark, sf_dir, "cdc_iceberg_equality_deletes")
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestRound13PlanDiscipline:
    """Plan assertions for the round-13 lakehouse/encoding additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_page_decode_v2_is_map_only(self, spark, sf_dir):
        """Row-group indices ride a tiny frame into one Arrow map —
        the v2/delta decode never joins or shuffles data rows."""
        plan = self._plan(spark, sf_dir, "ingest_parquet_page_decode_v2")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_delta_strings_decode_is_map_only(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "ingest_parquet_delta_strings")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_time_travel_scans_only_the_diff(self, spark, sf_dir):
        """Snapshot reconstruction is KB driver metadata; the data leg
        is a plain parquet scan of the differing files — no join, no
        exchange, no full-table read."""
        for name in ("cdc_delta_time_travel", "cdc_iceberg_time_travel"):
            plan = self._plan(spark, sf_dir, name)
            assert "Join" not in plan, (name, plan)
            assert "Exchange" not in plan, (name, plan)
            assert "Scan parquet" in plan, (name, plan)

    def test_iceberg_stats_pruning_scan_shape(self, spark, sf_dir):
        """Bounds decode in the distributed avrowire scan (pure-SQL
        byte swap, no Python row path); the data leg is a filtered
        parquet scan of survivors — no join anywhere."""
        plan = self._plan(spark, sf_dir, "cdc_iceberg_stats_pruning")
        assert "Join" not in plan, plan
        assert "Scan parquet" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_merge_read_is_plain_scan(self, spark, sf_dir):
        """After the commit, reading the merged table is log replay
        (KB) + one parquet scan of live files: the merge's join work
        happened once at write time, never per read."""
        plan = self._plan(spark, sf_dir, "cdc_delta_merge")
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan
        assert "Scan parquet" in plan, plan

    def test_merge_cdf_reads_only_change_data(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "cdc_delta_merge_cdf")
        assert "Join" not in plan, plan
        assert "Scan parquet" in plan, plan

    def test_merge_staging_plan_broadcasts(self, spark, sf_dir):
        """The copy-on-write rewrite itself (staging) must broadcast
        the matched-key sides — assert on the unexecuted merge plan
        rebuilt from the same expressions."""
        from pyspark.sql import functions as F

        from metricproxy_spark.io import load_table

        events = load_table(spark, sf_dir, "events").select(
            "event_id", "value"
        )
        n = events.agg(F.max("event_id") + 1).collect()[0][0]
        upd = events.where(
            (F.col("event_id") % 10 == 3) & (F.col("event_id") < n // 2)
        ).select("event_id", (F.col("value") + 1000).alias("new_value"))
        dele = events.where(
            (F.col("event_id") % 10 == 7) & (F.col("event_id") < n // 2)
        ).select("event_id")
        merged = (
            events.join(F.broadcast(dele), "event_id", "left_anti")
            .join(F.broadcast(upd), "event_id", "left")
            .withColumn("value", F.coalesce("new_value", "value"))
            .drop("new_value")
        )
        plan = _executed_plan(merged)
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_bloom_prune_read_is_map_only(self, spark, sf_dir):
        """Bloom checks are driver-side KB metadata; the data leg is
        one Arrow map over maybe-present groups — no join/shuffle."""
        plan = self._plan(spark, sf_dir, "ingest_parquet_bloom_prune")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_page_index_read_is_map_only(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "ingest_parquet_page_index_prune")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan


class TestRound14PlanDiscipline:
    """Plan assertions for the round-14 writer/lakehouse additions."""

    def _plan(self, spark, sf_dir, name):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        return _executed_plan(QUERIES[name](spark, sf_dir))

    def test_write_roundtrip_read_is_plain_scan(self, spark, sf_dir):
        """Reading back the own-writer files is an ordinary parquet
        scan — no join, no exchange, no Python row path: the writer's
        work happened once per partition at staging time."""
        plan = self._plan(spark, sf_dir, "ingest_parquet_write_roundtrip")
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan
        assert "Scan parquet" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_write_staging_is_one_shuffle_then_map(self, spark, sf_dir):
        """The distributed write shape: exactly one repartition
        exchange to spread rows, then embarrassingly parallel
        per-partition encode in one Arrow map — the 100 TB bulk-writer
        asymptote."""
        from pyspark.sql import functions as F

        from metricproxy_spark.io import load_table

        src = (
            load_table(spark, sf_dir, "events")
            .select("event_id", "event_type", "user_id", "value")
            .withColumn(
                "click_value",
                F.when(F.col("event_type") == "click", F.col("value")),
            )
            .repartition(8, "event_id")
        )

        def noop(batches):
            for pdf in batches:
                yield pdf.iloc[:0][["event_id"]]

        plan = _executed_plan(src.mapInPandas(noop, "event_id bigint"))
        assert plan.count("Exchange") == 1, plan
        assert "MapInPandas" in plan, plan
        assert "Join" not in plan, plan

    def test_merge_dv_read_is_map_only(self, spark, sf_dir):
        """The DV merge-on-read scan: per-file tasks drop bitmap
        positions inside the Arrow map — no join, no shuffle of data
        rows; DV bytes ride to the task scanning that file."""
        plan = self._plan(spark, sf_dir, "cdc_delta_merge_dv")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_column_mapping_read_is_plain_scan(self, spark, sf_dir):
        """Column mapping is alias-at-scan: no join, no exchange, no
        Python row path — a rename costs zero data I/O forever."""
        plan = self._plan(spark, sf_dir, "cdc_delta_column_mapping")
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan
        assert "Scan parquet" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_sequence_numbers_join_is_broadcast_only(self, spark, sf_dir):
        """The ordered delete application is ONE broadcast anti-join
        (deletion-sized side broadcast); no sort-merge, no cartesian
        product, no per-row Python."""
        plan = self._plan(spark, sf_dir, "cdc_iceberg_sequence_numbers")
        # hash join on the equality column; the sequence guard rides
        # as a residual condition, never a nested loop
        assert "BroadcastHashJoin" in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_write_pruned_read_is_map_only(self, spark, sf_dir):
        """The capstone over self-written files: planning is four KB
        footers on the driver; the data leg is per-(file, row-group)
        tasks decoding only surviving pages in one Arrow map."""
        plan = self._plan(spark, sf_dir, "ingest_parquet_write_pruned_read")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan
