"""Unit tests: k-means training convergence, CDC merge semantics,
upsert-sink replay idempotence, and property-based carbon parsing
(the reference's table-driven parse tests, generalized — SURVEY §6).
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _unit(vec):
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec]


def _planted_vectors():
    """3 well-separated unit anchors in 8-d, 20 deterministic
    perturbations each; vec_id encodes the planted cluster (id % 3)."""
    anchors = [
        _unit([1, 0, 0, 0, 1, 0, 0, 0]),
        _unit([0, 1, 0, 0, 0, 1, 0, 0]),
        _unit([0, 0, 1, 0, 0, 0, 1, 0]),
    ]
    rows = []
    for i in range(60):
        a = anchors[i % 3]
        # deterministic small wobble, index-derived (no RNG)
        eps = [((i * 7 + d * 3) % 11 - 5) * 0.01 for d in range(8)]
        rows.append((i, _unit([x + e for x, e in zip(a, eps)])))
    return rows


class TestKMeans:
    def test_train_recovers_planted_clusters(self, spark):
        from metricproxy_spark.operators.kmeans import assign, train_kmeans

        df = spark.createDataFrame(
            _planted_vectors(), "vec_id long, embedding array<double>"
        )
        centroids = train_kmeans(df, k=3, max_iter=6)
        crows = centroids.collect()
        assert len(crows) == 3
        for r in crows:  # spherical k-means keeps centroids unit-norm
            n = math.sqrt(sum(x * x for x in r["centroid_vec"]))
            assert abs(n - 1.0) < 1e-9
        labels = {
            r["vec_id"]: r["centroid_id"]
            for r in assign(df, centroids, "vec_id", "embedding").collect()
        }
        # every planted cluster maps to exactly one learned centroid,
        # and distinct planted clusters map to distinct centroids
        learned = [
            {labels[i] for i in range(60) if i % 3 == p} for p in range(3)
        ]
        assert all(len(s) == 1 for s in learned)
        assert len(set().union(*learned)) == 3

    def test_assign_is_deterministic_tiebreak(self, spark):
        from metricproxy_spark.operators.kmeans import assign

        # two identical centroids: the lower centroid_id must win
        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        cents = spark.createDataFrame(
            [(5, [1.0, 0.0]), (2, [1.0, 0.0])],
            "centroid_id long, centroid_vec array<double>",
        )
        out = assign(df, cents, "vec_id", "embedding").collect()
        assert len(out) == 1 and out[0]["centroid_id"] == 2


class TestMergeUpsert:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, v string, ts long, seq long"
        )

    def test_merge_upsert_semantics(self, spark):
        from metricproxy_spark.operators.cdc import merge_upsert

        base = self._df(spark, [(1, "a", 10, 0), (2, "b", 10, 0)])
        changes = self._df(
            spark,
            [
                (2, "b2", 20, 1),  # update k=2
                (2, "b3", 20, 2),  # later seq wins within key
                (3, "c", 20, 1),   # insert k=3
                (1, "DEL", 20, 1),  # tombstone k=1
            ],
        )
        out = merge_upsert(
            base,
            changes,
            keys=["k"],
            seq_cols=["ts", "seq"],
            delete_predicate=F.col("v") == "DEL",
        )
        got = {(r["k"], r["v"]) for r in out.collect()}
        assert got == {(2, "b3"), (3, "c")}

    def test_upsert_sink_replay_idempotent(self, spark, tmp_path):
        from metricproxy_spark.streaming.sinks import (
            read_latest_snapshot,
            upsert_sink,
        )

        path = str(tmp_path / "snap")
        sink = upsert_sink(
            path,
            keys=["k"],
            seq_cols=["ts", "seq"],
            delete_predicate=F.col("v") == "DEL",
        )
        b0 = self._df(spark, [(1, "a", 10, 0), (2, "b", 10, 0)])
        b1 = self._df(spark, [(1, "DEL", 20, 0), (3, "c", 20, 0)])
        sink(b0, 0)
        sink(b1, 1)
        want = {(2, "b"), (3, "c")}
        got = {
            (r["k"], r["v"])
            for r in read_latest_snapshot(spark, path).collect()
        }
        assert got == want
        # at-least-once replay of batch 1 (same batch_id) must not
        # change the final state
        sink(b1, 1)
        got2 = {
            (r["k"], r["v"])
            for r in read_latest_snapshot(spark, path).collect()
        }
        assert got2 == want


# --- property-based carbon parsing ---------------------------------

_NUM_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")
_INT_RE = re.compile(r"^[+-]?\d+$")


def _ref_parse(line: str):
    """Pure-Python model of parse_carbon_lines (drop_invalid=False).
    Mirrors Spark's split-on-single-space and try_cast semantics for
    the generated alphabet (no exponent/inf/nan tokens generated)."""
    parts = line.split(" ")
    name = parts[0] if len(parts) > 0 else None
    raw_value = parts[1] if len(parts) > 1 else None
    raw_ts = parts[2] if len(parts) > 2 else None
    value = (
        float(raw_value)
        if raw_value is not None and _NUM_RE.match(raw_value)
        else None
    )
    value_str = raw_value if value is None else None
    epoch = (
        int(raw_ts) if raw_ts is not None and _INT_RE.match(raw_ts) else None
    )
    is_valid = (
        len(parts) == 3
        and name is not None
        and name != ""
        and epoch is not None
    )
    return (name, value, value_str, epoch, is_valid)


# '.' only in the value slot: keeps generated timestamps integral so
# the Python int model and Spark's try_cast(bigint) agree; letters
# avoid e/E/n/N/i/I so no token parses as 1e5/nan/inf in one engine
# but not the other.
_name_tok = st.text(alphabet="0123456789-bcxyzg", min_size=0, max_size=8)
_value_tok = st.text(alphabet="0123456789.-bcxyzg", min_size=0, max_size=8)
_ts_tok = st.text(alphabet="0123456789-bcxyzg", min_size=0, max_size=8)
_line = st.one_of(
    st.builds(lambda n, v, t: f"{n} {v} {t}", _name_tok, _value_tok, _ts_tok),
    st.text(alphabet="0123456789-bcxyzg ", min_size=0, max_size=30),
)


class TestCarbonParseProperties:
    @settings(max_examples=8, deadline=None)
    @given(st.lists(_line, min_size=1, max_size=60))
    def test_parse_matches_python_model(self, spark, lines):
        from metricproxy_spark.sources.carbon import parse_carbon_lines

        df = spark.createDataFrame([(l,) for l in lines], "line string")
        got = [
            (
                r["metric"],
                r["value"],
                r["value_str"],
                r["epoch_s"],
                r["is_valid"],
            )
            for r in parse_carbon_lines(df, drop_invalid=False)
            .select("metric", "value", "value_str", "epoch_s", "is_valid")
            .collect()
        ]
        want = [_ref_parse(l) for l in lines]
        assert sorted(got, key=repr) == sorted(want, key=repr)

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.builds(
                lambda n, v, t: (n, v, t),
                st.text(alphabet="bcxyzg0123456789", min_size=1, max_size=6),
                st.integers(min_value=-10**6, max_value=10**6),
                st.integers(min_value=0, max_value=2**31 - 1),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_valid_lines_roundtrip(self, spark, triples):
        """Every well-formed (name, int value, ts) line parses valid and
        the K2 serializer reproduces the original bytes via the C7 meta
        passthrough."""
        from metricproxy_spark.sources.carbon import (
            parse_carbon_lines,
            to_carbon_lines,
        )

        lines = [f"{n} {v} {t}" for n, v, t in triples]
        df = spark.createDataFrame([(l,) for l in lines], "line string")
        parsed = parse_carbon_lines(df, drop_invalid=True)
        assert parsed.count() == len(lines)
        out = [
            r["out"]
            for r in parsed.select(
                to_carbon_lines(parsed).alias("out")
            ).collect()
        ]
        assert sorted(out) == sorted(lines)
