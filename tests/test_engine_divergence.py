"""Cross-engine divergence regression suite.

Every oracle in this repo leans on a set of measured facts about
where Spark and DuckDB AGREE (md5, levenshtein-on-ASCII, integer
division, decimal arithmetic) and where they DIVERGE (median over
DECIMAL, non-ASCII levenshtein, HOF evaluation quirks). These tests pin both
sides: if an engine upgrade shifts any of these behaviors, the suite
fails HERE with a named fact instead of a mysterious value-hash
mismatch in some query. Each test names the queries/levers that rely
on it. (Round-8 probe result: DOUBLE round() ties currently AGREE —
see that test for why the integer-output discipline stays anyway.)
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


class TestAgreements:
    """Facts the exact oracles RELY on."""

    def test_md5_identical(self, spark, duck):
        """Lever for dedup_minhash_exact / dedup_simhash_exact /
        ingest_rendezvous_route / ingest_hashring_route /
        ingest_deterministic_sample."""
        vals = ["", "a", "abc", "0:the quick", "shard-7:15", "é-unicode"]
        s = spark.sql(
            "SELECT " + ", ".join(f"md5('{v}')" for v in vals)
        ).first()
        d = duck.execute(
            "SELECT " + ", ".join(f"md5('{v}')" for v in vals)
        ).fetchone()
        assert tuple(s) == tuple(d)

    def test_hex_to_bigint_identical(self, spark, duck):
        """60-bit md5 prefix -> BIGINT (dedup_simhash_exact)."""
        s = spark.sql(
            "SELECT CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT)"
        ).first()[0]
        d = duck.execute(
            "SELECT CAST(('0x' || substr(md5('abc'), 1, 15)) AS BIGINT)"
        ).fetchone()[0]
        assert s == d == 648541476951500027

    def test_integer_division_identical(self, spark, duck):
        """div vs // on BIGINT including negatives near zero — the
        per-million langid weights, Hare quotas, LTTB bucket edges."""
        cases = [(7, 2), (1000 * 123, 997), (0, 5), (10**12 + 7, 37)]
        for a, b in cases:
            s = spark.sql(f"SELECT CAST({a} AS BIGINT) div {b}").first()[0]
            d = duck.execute(f"SELECT CAST({a} AS BIGINT) // {b}").fetchone()[0]
            assert s == d, (a, b)

    def test_levenshtein_ascii_identical(self, spark, duck):
        """analytic_fuzzy_join's documented ASCII-only contract."""
        pairs = [("kitten", "sitting"), ("abc", "abd"), ("", "xyz")]
        for a, b in pairs:
            s = spark.sql(f"SELECT levenshtein('{a}', '{b}')").first()[0]
            d = duck.execute(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
            assert s == d, (a, b)

    def test_decimal_sum_cast_double_identical(self, spark, duck):
        """The dsum discipline: DECIMAL accumulation is order-free and
        the final double cast is the same value bit-for-bit."""
        s = spark.sql(
            "SELECT CAST(SUM(CAST(x / 100 AS DECIMAL(27,4))) AS DOUBLE)"
            " FROM (SELECT explode(sequence(1, 9999)) AS x)"
        ).first()[0]
        d = duck.execute(
            "SELECT CAST(SUM(CAST(x / 100.0 AS DECIMAL(27,4))) AS DOUBLE)"
            " FROM (SELECT unnest(generate_series(1, 9999)) AS x)"
        ).fetchone()[0]
        assert s == d

    def test_string_min_max_on_hex_identical(self, spark, duck):
        """min/max over md5 hex strings (signature mins, sample
        bounds) — byte-wise ASCII collation both sides."""
        s = spark.sql(
            "SELECT min(md5(CAST(x AS STRING))), max(md5(CAST(x AS STRING)))"
            " FROM (SELECT explode(sequence(1, 500)) AS x)"
        ).first()
        d = duck.execute(
            "SELECT min(md5(CAST(x AS VARCHAR))), max(md5(CAST(x AS VARCHAR)))"
            " FROM (SELECT unnest(generate_series(1, 500)) AS x)"
        ).fetchone()
        assert tuple(s) == tuple(d)


class TestDivergences:
    """Facts the oracles must WORK AROUND — pinned so an engine
    upgrade that silently 'fixes' one is noticed (the workaround can
    then be retired deliberately, not discovered by accident)."""

    def test_round_double_ties_currently_agree(self, spark, duck):
        """Probed in round 8: BOTH engines round DOUBLE ties away from
        zero (1/128 -> 0.007813), so rounded-ratio oracles would work
        today — but dedup_minhash_exact still outputs integer
        (n_inter, n_union) because integer outputs depend on NO
        rounding contract at all. If either side ever flips to
        half-even, this pin localizes it."""
        s = spark.sql(
            "SELECT round(0.0078125D, 6), round(2.5D, 0), round(0.5D, 0)"
        ).first()
        d = duck.execute(
            "SELECT round(CAST(0.0078125 AS DOUBLE), 6),"
            " round(CAST(2.5 AS DOUBLE), 0), round(CAST(0.5 AS DOUBLE), 0)"
        ).fetchone()
        assert tuple(s) == tuple(d) == (0.007813, 3.0, 1.0)

    def test_levenshtein_non_ascii_diverges(self, spark, duck):
        """DuckDB counts BYTES, Spark counts CODEPOINTS — why fuzzy
        join claims oracle parity for ASCII inputs only."""
        s = spark.sql("SELECT levenshtein('é', 'e')").first()[0]
        d = duck.execute("SELECT levenshtein('é', 'e')").fetchone()[0]
        assert s == 1  # one codepoint substitution
        assert d == 2  # é is two UTF-8 bytes
        assert s != d

    def test_median_decimal_diverges_from_double(self, duck):
        """DuckDB median over DECIMAL takes the lower middle; over
        DOUBLE it interpolates (matching Spark percentile 0.5) — why
        hourly-rollup medians CAST TO DOUBLE in oracles."""
        dec = duck.execute(
            "SELECT median(CAST(x AS DECIMAL(10,2)))"
            " FROM (SELECT unnest([1, 2, 3, 4]) AS x)"
        ).fetchone()[0]
        dbl = duck.execute(
            "SELECT median(CAST(x AS DOUBLE))"
            " FROM (SELECT unnest([1, 2, 3, 4]) AS x)"
        ).fetchone()[0]
        assert float(dec) == 2.0  # lower middle
        assert dbl == 2.5  # interpolated

    def test_duckdb_nested_list_reduce_unreliable(self, duck):
        """A list_reduce nested inside another list_reduce's lambda is
        nondeterministic on multi-row inputs (round 8) — why
        events_lttb_exact's oracle uses list_transform +
        list_position(list_max(...)) for its inner argmax. This test
        pins the SAFE pattern (the broken one is nondeterministic, so
        asserting its brokenness would flake)."""
        rows = duck.execute(
            """
            SELECT g, list_reduce(
                list_prepend([CAST(0 AS BIGINT)],
                  list_transform(generate_series(1, 3), k -> [CAST(k AS BIGINT)])),
                (acc, e) -> list_append(acc,
                  CAST(list_position(
                    list_transform(generate_series(1, 4), i -> i + acc[-1]),
                    list_max(list_transform(generate_series(1, 4), i -> i + acc[-1]))
                  ) AS BIGINT))
            ) AS r
            FROM (SELECT unnest(generate_series(1, 5)) AS g)
            """
        ).fetchall()
        # max of i + acc[-1] is always at i = 4 -> every step appends 4
        assert all(list(r) == [0, 4, 4, 4] for _, r in rows), rows

    def test_duckdb_single_unnest_subquery_pattern_zips(self, duck):
        """Round-8 observation: TWO unnest() calls in one projection
        over an expensively-computed CTE list (nested HOFs) produced
        misaligned values in the LTTB oracle; the fix unnests ONCE in
        a subquery and indexes the original list. This pins that safe
        pattern's alignment (DuckDB lists are 1-based — l[idx + 1]
        with a 0-based idx is the self element)."""
        rows = duck.execute(
            """
            WITH s AS (SELECT [10, 20, 30] AS l)
            SELECT v, l[idx + 2] AS nxt FROM (
                SELECT l, unnest(l) AS v,
                       unnest(generate_series(0, len(l) - 1)) AS idx
                FROM s
            )
            """
        ).fetchall()
        assert rows == [(10, 20), (20, 30), (30, None)]

    def test_duckdb_date_diff_counts_boundaries(self, duck):
        """date_diff('second', ...) counts BOUNDARY CROSSINGS, not
        elapsed time — why sessionize-family oracles difference
        unix_micros instead (r3 lesson)."""
        d = duck.execute(
            "SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:59:59',"
            " TIMESTAMP '2024-01-01 01:00:01')"
        ).fetchone()[0]
        assert d == 1  # two seconds elapsed, one boundary crossed

    def test_spark_element_at_requires_int_index(self, spark):
        """element_at/slice need INT indices; BIGINT lambda vars must
        cast (why the LTTB fold writes int(i + 1))."""
        from pyspark.errors import AnalysisException

        with pytest.raises(AnalysisException):
            spark.sql(
                "SELECT element_at(array(1, 2), CAST(1 AS BIGINT) + 1)"
            ).first()
        ok = spark.sql(
            "SELECT element_at(array(1, 2), int(CAST(1 AS BIGINT) + 1))"
        ).first()[0]
        assert ok == 2
