"""Round-6 operator tests: k-hop HLL variant + hub cap, recurrence
group guards, PCA variance cross-check."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricproxy_spark.registry import QUERIES, load_all

load_all()


def _q(name):
    return QUERIES[name]


class TestKhopApprox:
    def test_estimate_tracks_exact_within_hll_bound(self, spark, sf_dir):
        exact = {
            r.supplier_id: (r.n_customers, r.n_peer_suppliers)
            for r in _q("graph_khop_reach")(spark, sf_dir).collect()
        }
        approx = {
            r.supplier_id: (r.n_customers, r.est_peer_suppliers)
            for r in _q("graph_khop_reach_approx")(spark, sf_dir).collect()
        }
        assert set(exact) == set(approx)
        for supp, (n_cust, n_peer) in exact.items():
            a_cust, a_peer = approx[supp]
            assert a_cust == n_cust  # hop-1 stays exact
            # lgK=12 => ~1.6% standard error; allow 5% + 2 absolute
            assert abs(a_peer - n_peer) <= max(2, 0.05 * n_peer), (
                supp, n_peer, a_peer,
            )

    def test_hub2_union_is_mergeable_partial_state(self, spark, sf_dir):
        """The sketch union must map-side combine (partial_hll_union_agg
        below the exchange) — that is what makes the shuffle linear in
        edges instead of Σ deg² pairs."""
        df = _q("graph_khop_reach_approx")(spark, sf_dir)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_hll_union_agg" in plan, plan

    def test_hub_cap_bounds_hop2_and_preserves_hop1(self, spark, sf_dir):
        from metricproxy_spark.queries.graph import _khop_exact, _khop_half

        half = _khop_half(spark, sf_dir)
        max_deg = (
            half.groupBy("cust")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        uncapped = {
            r.supplier_id: (r.n_customers, r.n_peer_suppliers)
            for r in _khop_exact(half).collect()
        }
        at_max = {
            r.supplier_id: (r.n_customers, r.n_peer_suppliers)
            for r in _khop_exact(half, hub_cap=max_deg).collect()
        }
        assert at_max == uncapped  # cap >= max degree is a no-op
        capped = {
            r.supplier_id: (r.n_customers, r.n_peer_suppliers)
            for r in _khop_exact(half, hub_cap=max(1, max_deg // 2)).collect()
        }
        assert set(capped) == set(uncapped)
        for supp, (n_cust, n_peer) in capped.items():
            assert n_cust == uncapped[supp][0]  # hop-1 untouched
            assert n_peer <= uncapped[supp][1]  # hop-2 only shrinks

    def test_hub_cap_drops_planted_hub(self, spark):
        # 1 hub customer linked to every supplier + sparse tail:
        # capping at 2 removes exactly the hub's clique contribution
        from metricproxy_spark.queries.graph import _khop_exact

        edges = [(99, s) for s in range(1, 6)]  # hub cust 99 -> s1..s5
        edges += [(1, 1), (1, 2), (2, 3)]  # tail: cust1 {s1,s2}, cust2 {s3}
        half = spark.createDataFrame(edges, "cust int, supp int")
        capped = {
            r.supplier_id: r.n_peer_suppliers
            for r in _khop_exact(half, hub_cap=2).collect()
        }
        # only cust1's pair {s1, s2} survives hop 2
        assert capped == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


class TestGuardedSeries:
    def _hot(self, spark, n=500):
        return spark.range(n).select(
            F.lit("hot").alias("k"),
            F.col("id").alias("ord"),
            (F.col("id") * 2).cast("double").alias("value"),
        )

    def test_guard_fires_on_hot_group(self, spark):
        import pytest

        from metricproxy_spark.operators.scale import guarded_series

        df = self._hot(spark)
        out = guarded_series(
            df, ["k"], ["ord", "value"], guard_rows=100
        )
        with pytest.raises(Exception, match="exceeds guard_rows"):
            out.collect()

    def test_guard_passes_under_bound(self, spark):
        from metricproxy_spark.operators.scale import guarded_series

        df = self._hot(spark, n=50)
        rows = guarded_series(
            df, ["k"], ["ord", "value"], guard_rows=100
        ).collect()
        assert len(rows) == 1 and rows[0].group_n == 50
        assert len(rows[0].rows) == 50

    def test_cap_mode_truncates_deterministically(self, spark):
        from metricproxy_spark.operators.scale import guarded_series

        df = self._hot(spark, n=500)
        rows = guarded_series(
            df, ["k"], ["ord", "value"], guard_rows=100, on_overflow="cap"
        ).collect()
        assert rows[0].group_n == 500  # true size still reported
        kept = [r.ord for r in rows[0].rows]
        assert kept == list(range(100))  # first 100 in order, exactly

    def test_recurrence_queries_use_the_guard(self, spark, sf_dir):
        # the three sequential-recurrence queries route through
        # guarded_series: their plans all carry the group_n count
        for name in ("events_ema", "events_holt_trend", "events_cusum_score"):
            df = _q(name)(spark, sf_dir)
            plan = df._jdf.queryExecution().analyzed().toString()
            assert "group_n" in plan, name


class TestGreedyPacker:
    def test_greedy_invariants(self, spark, sf_dir):
        rows = _q("pipeline_pack_greedy")(spark, sf_dir).collect()
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        assert len(rows) > 0
        for shard, docs in by_shard.items():
            docs.sort(key=lambda r: r.doc_id)
            used, seq = 0, 0
            for r in docs:
                fits = used + r.n_tokens <= 512 or used == 0
                if fits:
                    assert r.seq_in_shard == seq, (shard, r)
                    assert r.seq_offset == used, (shard, r)
                    used += r.n_tokens
                else:  # greedy: new sequence exactly when it spills
                    seq += 1
                    assert r.seq_in_shard == seq, (shard, r)
                    assert r.seq_offset == 0, (shard, r)
                    used = r.n_tokens

    def test_oversized_doc_gets_own_sequence(self, spark):
        from metricproxy_spark.registry import QUERIES

        # tokens [5, 510, 10] in one shard: 510 spills into its own
        # sequence, then 10 spills again (510+10 > 512)
        import os
        import tempfile

        import pandas as pd

        d = tempfile.mkdtemp()
        pdf = pd.DataFrame(
            {
                "doc_id": [0, 16, 32],  # same shard (doc_id % 16 == 0)
                "lang": ["en"] * 3,
                "text": ["a " * 5, "b " * 510, "c " * 10],
            }
        )
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        got = {
            r.doc_id: (r.seq_in_shard, r.seq_offset)
            for r in QUERIES["pipeline_pack_greedy"](spark, d).collect()
        }
        assert got == {0: (0, 0), 16: (1, 0), 32: (2, 0)}


class TestImageDhash:
    def test_dhash_properties(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import dhash64

        x = np.arange(32)[None, :]
        y = np.arange(32)[:, None]
        base = ((x + 1) * (y + 2) * 7 % 256).astype(np.uint8)
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        # brightness-shift invariance (modulo clipping at the edges)
        shifted = np.clip(base.astype(int) + 25, 0, 255)
        assert ham(dhash64(base), dhash64(shifted)) <= 2
        # local perturbation flips only local grid bits
        twin = base.copy()
        twin[0:4, :] = np.clip(twin[0:4, :].astype(int) + 40, 0, 255)
        assert ham(dhash64(base), dhash64(twin)) <= 16
        # different content is far
        other = ((x + 1) * (y + 2) * 11 % 256).astype(np.uint8)
        assert ham(dhash64(base), dhash64(other)) > 16
        # RGB reduces through luminance
        rgb = np.stack([base] * 3, axis=2)
        assert dhash64(rgb) == dhash64(base)

    def test_planted_image_pairs_found(self, spark, sf_dir):
        from metricproxy_spark.io import load_table

        n_docs = load_table(spark, sf_dir, "documents").count()
        pairs = {
            (r.id_a, r.id_b)
            for r in _q("dedup_image_dhash")(spark, sf_dir).collect()
        }
        planted = {
            (i, i + 250) for i in range(max(0, min(250, n_docs - 250)))
        }
        missing = planted - pairs
        assert not missing, f"{len(missing)} planted pairs missed"
        # same-variant different-g docs are NOT near-dups
        assert (0, 1) not in pairs and (1, 2) not in pairs


class TestResampleResize:
    def test_resample_2x_exact_on_ramp(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import resample_linear

        s = (3 * np.arange(100) - 20).astype(np.int16)
        r = resample_linear(s, 8000, 16000)
        assert r.shape[0] == 199
        exp = 3 * (np.arange(199) / 2.0) - 20
        assert np.array_equal(r, exp)

    def test_resample_arbitrary_ratio_bounded(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import resample_linear

        t = np.arange(0, 1, 1 / 8000)
        sig = np.sin(2 * np.pi * 50 * t)
        down = resample_linear(sig, 8000, 6000)
        # a 50 Hz tone survives 3/4 resampling nearly unchanged:
        # compare against the analytic tone at the resampled times
        t2 = np.arange(down.shape[0]) / 6000
        err = np.abs(down - np.sin(2 * np.pi * 50 * t2)).max()
        assert err < 1e-3, err

    def test_resize_area_uneven_boxes_mean_preserving(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import resize_area

        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (24, 24), np.uint8)
        small = resize_area(px, 16, 16)
        # area averaging preserves the GLOBAL mean when every source
        # pixel lands in exactly one box of equal weight... boxes are
        # unequal here (1 or 2 wide), so check per-box means directly
        re = np.linspace(0, 24, 17).astype(int)
        for r in (0, 7, 15):
            for c in (0, 8, 15):
                box = px[re[r] : re[r + 1], re[c] : re[c + 1]]
                assert small[r, c] == box.mean()

    def test_resize_rgb_channels_independent(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import resize_area

        rng = np.random.default_rng(10)
        px = rng.integers(0, 256, (16, 16, 3), np.uint8)
        small = resize_area(px, 8, 8)
        assert small.shape == (8, 8, 3)
        for ch in range(3):
            assert np.array_equal(
                small[:, :, ch], resize_area(px[:, :, ch], 8, 8)
            )


class TestIntervalOverlapJoin:
    """interval_overlap_join: bucketed decomposition == naive theta join,
    each overlapping pair exactly once, replication bounded."""

    def _mk(self, spark, rows, prefix):
        s, e = f"{prefix}_start", f"{prefix}_end"
        return spark.createDataFrame(
            [(k, a, b) for k, a, b in rows],
            f"{prefix}_key long, {s} long, {e} long",
        )

    def test_matches_naive_cross_join(self, spark):
        import itertools

        # Deterministic pseudo-random intervals incl. bucket-straddlers,
        # touching endpoints, containments and long spans.
        lrows = [
            (i, (i * 37) % 100, (i * 37) % 100 + (i * 13) % 45 + 1)
            for i in range(40)
        ]
        rrows = [
            (j, (j * 29 + 7) % 110, (j * 29 + 7) % 110 + (j * 11) % 30 + 1)
            for j in range(35)
        ]
        expected = sorted(
            (lk, rk)
            for (lk, ls, le), (rk, rs, re) in itertools.product(lrows, rrows)
            if ls <= re and rs <= le
        )
        from metricproxy_spark.operators.rangejoin import interval_overlap_join

        for width in (1, 8, 32, 1000):  # incl. degenerate single-bucket
            got = interval_overlap_join(
                self._mk(spark, lrows, "l"),
                self._mk(spark, rrows, "r"),
                "l_start", "l_end", "r_start", "r_end",
                bucket_width=width,
            ).select("l_key", "r_key").collect()
            pairs = sorted((r.l_key, r.r_key) for r in got)
            assert pairs == expected, f"width={width}"
            assert len(pairs) == len(set(pairs)), "duplicate pair emitted"

    def test_extra_on_and_validation(self, spark):
        import pytest as _pytest

        from metricproxy_spark.operators.rangejoin import interval_overlap_join

        left = self._mk(spark, [(1, 0, 10), (2, 0, 10)], "l").withColumn(
            "grp", F.col("l_key") % 2
        )
        right = self._mk(spark, [(3, 5, 6), (4, 5, 6)], "r").withColumn(
            "rgrp", F.col("r_key") % 2
        )
        got = interval_overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end",
            bucket_width=4, extra_on=F.col("grp") == F.col("rgrp"),
        ).select("l_key", "r_key").collect()
        assert sorted((r.l_key, r.r_key) for r in got) == [(1, 3), (2, 4)]
        with _pytest.raises(ValueError):
            interval_overlap_join(
                left, right, "l_start", "l_end", "r_start", "r_end",
                bucket_width=0,
            )


class TestKalmanLevel:
    """events_kalman_level semantics vs an independent NumPy reference
    (the registry oracle only proves cross-engine agreement; this
    proves both engines run the RIGHT filter)."""

    def test_matches_numpy_reference(self, spark, sf_dir):
        import numpy as np

        from metricproxy_spark.io import load_table
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        got = {
            (r.event_type, str(r.day)): r
            for r in QUERIES["events_kalman_level"](spark, sf_dir).collect()
        }
        src = (
            load_table(spark, sf_dir, "events")
            .select("event_type", "ts", "event_id", "value")
            .toPandas()
        )
        src["day"] = src["ts"].dt.floor("D")
        q, rnoise = 0.01, 1.0
        checked = 0
        for (etype, day), grp in src.groupby(["event_type", "day"]):
            zs = grp.sort_values(["ts", "event_id"])["value"].to_numpy()
            x, p = float(zs[0]), 1.0
            for z in zs[1:]:
                pp = p + q
                k = pp / (pp + rnoise)
                x = x + k * (z - x)
                p = (1.0 - k) * pp
            row = got[(etype, str(day))]
            assert row.n == len(zs)
            assert np.isclose(row.level_end, x, rtol=0, atol=1e-12)
            assert np.isclose(row.variance_end, p, rtol=0, atol=1e-15)
            # steady-state gain of the local-level model:
            # K* = (q + sqrt(q^2 + 4qR)) / (2R + q + sqrt(q^2 + 4qR))
            kstar = (q + np.sqrt(q * q + 4 * q * rnoise)) / (
                2 * rnoise + q + np.sqrt(q * q + 4 * q * rnoise)
            )
            if len(zs) > 50:
                assert abs(row.gain_end - kstar) < 1e-6
            checked += 1
        assert checked == len(got) > 0


class TestKllQuantiles:
    """KLL sketch: rank-error bound vs exact, merge consistency, and
    map-side partial aggregation in the plan."""

    def test_rank_error_bound_and_merge(self, spark, sf_dir):
        from metricproxy_spark.io import load_table
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        out = {r.event_type: r for r in
               QUERIES["analytic_kll_quantiles"](spark, sf_dir).collect()}
        vals = (
            load_table(spark, sf_dir, "events")
            .select("event_type", "value")
            .toPandas()
        )
        # KLL k=200 normalized rank error ≈ 1.65%; assert a safe 3.5%.
        eps = 0.035
        for etype, grp in vals.groupby("event_type"):
            v = grp["value"].sort_values().to_numpy()
            row = out[etype]
            assert row.n == len(v)
            for q, est in ((0.5, row.kll_p50), (0.95, row.kll_p95),
                           (0.99, row.kll_p99)):
                true_rank = (v <= est).mean()
                assert abs(true_rank - q) <= eps, (etype, q, est, true_rank)
        # the ALL row is the MERGE of per-type sketches — same bound
        # against the global distribution proves merge preserves it
        v = vals["value"].sort_values().to_numpy()
        allrow = out["ALL"]
        assert allrow.n == len(v)
        for q, est in ((0.5, allrow.kll_p50), (0.95, allrow.kll_p95),
                       (0.99, allrow.kll_p99)):
            true_rank = (v <= est).mean()
            assert abs(true_rank - q) <= eps, ("ALL", q, est, true_rank)

    def test_partial_aggregation_in_plan(self, spark, sf_dir):
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        plan = QUERIES["analytic_kll_quantiles"](
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        # sketch agg must combine map-side (ObjectHashAggregate partial)
        # so the shuffle moves one sketch per (partition, key), not rows
        assert "partial_kll_sketch_agg_double" in plan, plan[:4000]


class TestLttbExactFold:
    """events_lttb_exact's integer LTTB fold (round 8): the Spark
    `aggregate` expression matches a plain-python reference on random
    series — endpoints fixed, one pick per bucket, picks strictly
    increasing."""

    @staticmethod
    def _ref(vals, T):
        N, nb, sel = len(vals), T - 2, [0]
        for k in range(nb):
            lo, hi = 1 + (k * (N - 2)) // nb, ((k + 1) * (N - 2)) // nb
            if k == nb - 1:
                nlo = nhi = N - 1
            else:
                nlo = 1 + ((k + 1) * (N - 2)) // nb
                nhi = ((k + 2) * (N - 2)) // nb
            m = nhi - nlo + 1
            st = (m * (nlo + nhi)) // 2
            sv = sum(vals[nlo : nhi + 1])
            p, best = sel[-1], (-1, -1)
            for i in range(lo, hi + 1):
                sc = abs(
                    (p * m - st) * (vals[i] - vals[p])
                    - (p - i) * (sv - m * vals[p])
                )
                if sc > best[1]:
                    best = (i, sc)
            sel.append(best[0])
        sel.append(N - 1)
        return sel

    def test_spark_fold_matches_reference(self, spark):
        import random

        from metricproxy_spark.queries.events import _lttb_exprs

        spark_e, _ = _lttb_exprs(12)
        rng = random.Random(11)
        cases = [
            [rng.randrange(0, 10_000_000) for _ in range(n)]
            for n in (12, 13, 50, 681)
        ]
        df = spark.createDataFrame(
            [(v,) for v in cases], "vals array<long>"
        ).selectExpr("cast(size(vals) as long) as n", "vals")
        got = [r.picks for r in df.selectExpr(f"{spark_e} as picks").collect()]
        for vals, picks in zip(cases, got):
            ref = self._ref(vals, 12)
            assert list(picks) == ref
            assert picks[0] == 0 and picks[-1] == len(vals) - 1
            assert all(a < b for a, b in zip(picks, picks[1:]))
