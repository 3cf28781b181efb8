"""The inferred-schema memo in io.load_table (optimization round 14).

``spark.read.parquet(path)`` re-infers the schema from the footer on
every call (~120-350 ms each); ``load_table`` now infers once per
(path, size, mtime) and hands the schema to subsequent readers. These
tests pin the two properties that make that safe:

- the memoized reader returns the identical schema and rows as a plain
  inference read (nothing about *results* is cached — only the static
  file metadata a real engine would hold in its catalog);
- the memo key includes the file stats, so a REGENERATED file (new
  size/mtime) misses the memo and is re-inferred, never served stale.
"""

from __future__ import annotations

import os
import shutil

from tests.conftest import SF_SMOKE


class TestSchemaMemo:
    def test_memoized_read_matches_plain_inference(self, spark):
        from metricproxy_spark.io import TABLES, load_table, table_path

        for name in ("lineitem", "region", "documents"):
            assert name in TABLES
            memo = load_table(spark, SF_SMOKE, name)
            plain = spark.read.parquet(table_path(SF_SMOKE, name))
            assert memo.schema == plain.schema
            assert sorted(map(str, memo.collect())) == sorted(
                map(str, plain.collect())
            )

    def test_events_ts_normalization_unchanged(self, spark):
        from metricproxy_spark.io import load_table

        df = load_table(spark, SF_SMOKE, "events")
        # the normalized surface stays a session-local TIMESTAMP
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.limit(5).count() == 5

    def test_regenerated_file_misses_the_memo(self, spark, tmp_path):
        from metricproxy_spark.io import _SCHEMA_CACHE, _read_parquet_cached

        p = str(tmp_path / "t.parquet")
        spark.range(10).selectExpr("id AS a").write.parquet(p)
        first = _read_parquet_cached(spark, p)
        assert first.schema.fieldNames() == ["a"]
        # key = kind + path tuple since round 15; the stat stamp lives
        # in the VALUE so a regeneration replaces the entry in place
        key = ("parquet", p)
        assert key in _SCHEMA_CACHE
        stale_stamp = _SCHEMA_CACHE[key][0]

        # regenerate with a DIFFERENT schema at the same path
        shutil.rmtree(p)
        spark.range(10).selectExpr(
            "id AS a", "id * 2 AS b"
        ).write.parquet(p)
        second = _read_parquet_cached(spark, p)
        assert second.schema.fieldNames() == ["a", "b"]
        assert second.count() == 10
        # the superseded generation's entry was REPLACED, not leaked
        # (r14 ADVICE: stamp-in-key left one dead entry per generation)
        assert _SCHEMA_CACHE[key][0] != stale_stamp
        assert (
            sum(1 for k in _SCHEMA_CACHE if k == key) == 1
        )

    def test_unstampable_paths_skip_the_memo(self, spark, tmp_path):
        """An empty glob match or a vanished file is uncacheable: the
        read falls back to plain inference instead of memoizing an
        empty stamp that a later file at that path would HIT stale
        (r14 ADVICE)."""
        import json

        from metricproxy_spark.io import (
            _SCHEMA_CACHE,
            _path_stamp,
            read_json_cached,
        )

        d = tmp_path / "spool"
        d.mkdir()
        g = str(d / "*.json")
        assert _path_stamp(g) is None  # empty glob: unstampable
        assert _path_stamp(str(tmp_path / "gone.parquet")) is None

        (d / "0.json").write_text(json.dumps({"a": 1}) + "\n")
        first = read_json_cached(spark, g)
        assert first.columns == ["a"]
        # a later file reshaping the glob is never served a stale memo
        (d / "1.json").write_text(json.dumps({"b": 2}) + "\n")
        again = read_json_cached(spark, g)
        assert set(again.columns) == {"a", "b"}
        assert ("json", g) in _SCHEMA_CACHE  # non-empty glob memoizes

    def test_memo_is_schema_only_not_rows(self, spark, tmp_path):
        """Rows always come from the parquet bytes on disk: rewriting
        the file contents (same schema) is reflected on the next read."""
        from metricproxy_spark.io import _read_parquet_cached

        p = str(tmp_path / "rows.parquet")
        spark.range(3).write.parquet(p)
        assert _read_parquet_cached(spark, p).count() == 3
        shutil.rmtree(p)
        spark.range(7).write.parquet(p)
        assert _read_parquet_cached(spark, p).count() == 7

    def test_multi_path_read_matches_plain(self, spark, tmp_path):
        """The *paths form (staged-artifact sites) returns the same
        schema and rows as plain multi-path inference."""
        from metricproxy_spark.io import read_parquet_cached

        p1 = str(tmp_path / "a.parquet")
        p2 = str(tmp_path / "b.parquet")
        spark.range(0, 5).write.parquet(p1)
        spark.range(5, 9).write.parquet(p2)
        memo = read_parquet_cached(spark, p1, p2)
        plain = spark.read.parquet(p1, p2)
        assert memo.schema == plain.schema
        assert sorted(r["id"] for r in memo.collect()) == sorted(
            r["id"] for r in plain.collect()
        )

    def test_json_memo_matches_plain_inference(self, spark, tmp_path):
        """read_json_cached stores exactly what inference produced:
        schema AND rows agree with spark.read.json on a glob, and a
        rewritten file (new stat) misses the memo."""
        import json

        from metricproxy_spark.io import read_json_cached

        d = tmp_path / "log"
        d.mkdir()
        (d / "0.json").write_text(json.dumps({"add": {"path": "x"}}) + "\n")
        (d / "1.json").write_text(json.dumps({"remove": {"path": "x"}}) + "\n")
        g = str(d / "*.json")
        memo = read_json_cached(spark, g)
        plain = spark.read.json(g)
        assert memo.schema == plain.schema
        assert sorted(map(str, memo.collect())) == sorted(
            map(str, plain.collect())
        )
        # regenerate with a new top-level field: schema re-inferred
        (d / "1.json").write_text(
            json.dumps({"metaData": {"id": "t"}}) + "\n"
        )
        again = read_json_cached(spark, g)
        assert "metaData" in again.columns
