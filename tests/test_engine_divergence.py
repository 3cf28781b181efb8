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


    def test_percentile_quantile_cont_identical_on_double(self, spark, duck):
        """Lever for events_promql_quantile_over_time: Spark
        `percentile` and DuckDB `quantile_cont` implement the same
        sorted-samples linear interpolation over DOUBLE and agree
        bit-for-bit (probed round 9 on awkward operands). NB the
        agreement holds for DOUBLE inputs only — see the DECIMAL
        divergence test below."""
        vals = [1.37, 2.91, 5.03, 7.77, 11.113, 13.0001, 17.5,
                23.23, 0.013, 42.42, 3.14159, 2.71828]
        arr = "ARRAY(" + ",".join(f"CAST({v} AS DOUBLE)" for v in vals) + ")"
        for q in (0.5, 0.9, 0.95, 0.99, 0.1, 0.37):
            s_val = spark.sql(
                f"SELECT percentile(v, CAST({q} AS DOUBLE))"
                f" FROM (SELECT explode({arr}) AS v)"
            ).first()[0]
            d_val = duck.execute(
                f"SELECT quantile_cont(CAST(v AS DOUBLE), {q}) FROM"
                f" (SELECT unnest({vals}) AS v)"
            ).fetchone()[0]
            assert s_val == d_val, (q, s_val, d_val)

    def test_bin_bit_length_identical(self, spark, duck):
        """Lever for events_exp_histogram: length(bin(v)) - 1 is the
        exact floor(log2) both engines compute identically (no
        leading zeros in either bin())."""
        for v in (1, 2, 3, 7, 8, 100, 65535, 65536, 4900200, 2**62):
            s_val = spark.sql(
                f"SELECT length(bin(CAST({v} AS BIGINT))) - 1"
            ).first()[0]
            d_val = duck.execute(
                f"SELECT length(bin(CAST({v} AS BIGINT))) - 1"
            ).fetchone()[0]
            assert s_val == d_val == v.bit_length() - 1, v

    def test_regexp_backreference_spelling_same_semantics(self, spark, duck):
        """Lever for ingest_carbon_aggregation_rules /
        text_pii_scrub_corpus: capture-group rewrite agrees although
        the backreference SPELLING differs (Spark/Java `$1`, DuckDB
        RE2 `\\1`), and DuckDB needs the explicit 'g' flag for
        global replacement while Spark is global by default."""
        src = "events.click.123 events.view.9"
        pat = r"events\.([a-z]+)\.[0-9]+"
        s_val = spark.sql(
            f"SELECT regexp_replace('{src}', r'{pat}', 'events.$1.all')"
        ).first()[0]
        d_val = duck.execute(
            f"SELECT regexp_replace('{src}', '{pat}', 'events.\\1.all', 'g')"
        ).fetchone()[0]
        assert s_val == d_val == "events.click.all events.view.all"

    def test_nfc_normalize_matches_python_unicodedata(self, duck):
        """Lever for text_unicode_nfc: DuckDB's utf8proc NFC and
        Python's unicodedata NFC agree on composition (two
        independent UAX #15 implementations)."""
        import unicodedata

        cases = [
            "a\u0308", "e\u0301", "o\u0303", "c\u0327",
            "fian\u0303ce", "\u00e9 composed", "plain ascii",
            "x\u0301\u0308 stacked",
        ]
        for c in cases:
            d_val = duck.execute(
                "SELECT nfc_normalize(?)", [c]
            ).fetchone()[0]
            assert d_val == unicodedata.normalize("NFC", c), repr(c)

    def test_string_agg_order_matches_sorted_collect(self, spark, duck):
        """Lever for events_sax_symbols: DuckDB string_agg(s, ''
        ORDER BY k) equals Spark's concat_ws over array_sort of
        (k, s) structs."""
        rows = [(3, "c"), (1, "a"), (2, "b"), (0, "z")]
        s_val = spark.sql(
            "SELECT concat_ws('', transform(array_sort(collect_list("
            "struct(k, s))), x -> x.s)) FROM VALUES (3,'c'),(1,'a'),"
            "(2,'b'),(0,'z') AS t(k, s)"
        ).first()[0]
        d_val = duck.execute(
            "SELECT string_agg(s, '' ORDER BY k) FROM (VALUES (3,'c'),"
            "(1,'a'),(2,'b'),(0,'z')) t(k, s)"
        ).fetchone()[0]
        assert s_val == d_val == "zabc"


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

    def test_quantile_cont_decimal_diverges(self, duck):
        """quantile_cont over DECIMAL truncates to the decimal scale
        (round-9 probe: q=0.95 over 4dp values gave 31.86549 vs
        DOUBLE's 31.865499999999987) — quantile oracles must CAST TO
        DOUBLE first, same rule as the median pin below."""
        d_dec, d_dbl = duck.execute(
            "SELECT quantile_cont(CAST(v AS DECIMAL(18,5)), 0.95),"
            " quantile_cont(CAST(v AS DOUBLE), 0.95) FROM"
            " (SELECT unnest([1.37, 2.91, 5.03, 7.77, 11.113, 13.0001,"
            " 17.5, 23.23, 0.013, 42.42, 3.14159, 2.71828]) AS v)"
        ).fetchone()
        assert float(d_dec) != d_dbl

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


class TestRound10Levers:
    """Facts the round-10 wire-format oracles rely on."""

    def test_python_repr_spark_cast_double_roundtrip(self, spark):
        """Lever for ingest_snappy_framed_carbon (and every text wire
        format that writes values with Python repr): repr(float) is
        the shortest round-trip decimal, and Spark CAST(string AS
        DOUBLE) restores the identical IEEE bits."""
        import struct

        vals = [
            0.1, -2.5, 1e-300, 1.7976931348623157e308,
            3.141592653589793, 123456.789012345, -0.0, 2.0**-40,
        ]
        exprs = ", ".join(f"cast('{v!r}' as double)" for v in vals)
        got = spark.sql(f"SELECT {exprs}").first()
        for v, g in zip(vals, got):
            assert struct.pack("<d", v) == struct.pack("<d", g), (v, g)

    def test_duckdb_varchar_cast_double_agrees(self, duck):
        """The same repr strings parse to identical doubles in DuckDB
        (the oracle side never parses in the framed-carbon query —
        this pins that it COULD, i.e. the repr text is engine-neutral)."""
        import struct

        vals = [0.1, -2.5, 1e-300, 3.141592653589793, 2.0**-40]
        exprs = ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in vals)
        got = duck.execute(f"SELECT {exprs}").fetchone()
        for v, g in zip(vals, got):
            assert struct.pack("<d", v) == struct.pack("<d", g), (v, g)

    def test_epoch_us_times_1000_agrees_with_unix_micros(self, spark, duck):
        """Lever for ingest_otlp_protobuf / stream_otlp_protobuf_pipeline:
        nanosecond timestamps derive as micros x 1000 on both sides."""
        ts = "2026-03-01 12:34:56.789123"
        s = spark.sql(
            f"SELECT unix_micros(timestamp'{ts}') * 1000"
        ).first()[0]
        d = duck.execute(
            f"SELECT epoch_us(TIMESTAMP '{ts}') * 1000"
        ).fetchone()[0]
        assert s == d == 1772368496789123000

    def test_strftime_date_format_day_agrees(self, spark, duck):
        """Lever for ingest_remote_write_v2's day label: DuckDB
        strftime('%Y-%m-%d') ≡ Spark date_format('yyyy-MM-dd')."""
        s = spark.sql(
            "SELECT date_format(timestamp'2026-01-05 23:59:59',"
            " 'yyyy-MM-dd')"
        ).first()[0]
        d = duck.execute(
            "SELECT strftime(TIMESTAMP '2026-01-05 23:59:59', '%Y-%m-%d')"
        ).fetchone()[0]
        assert s == d == "2026-01-05"

    def test_range_interval_frames_inclusive_both_engines(self, spark, duck):
        """Lever for events_slo_burn_rate (and events_time_range_frame,
        where this was first probed): RANGE BETWEEN INTERVAL n HOUR
        PRECEDING AND CURRENT ROW includes a row exactly n hours back
        in BOTH engines."""
        q_spark = """
        SELECT SUM(v) OVER (ORDER BY t
            RANGE BETWEEN INTERVAL '5' HOUR PRECEDING AND CURRENT ROW)
        FROM VALUES (timestamp'2026-01-01 00:00:00', 1),
                    (timestamp'2026-01-01 05:00:00', 10),
                    (timestamp'2026-01-01 11:00:00', 100) AS t(t, v)
        ORDER BY t
        """
        q_duck = """
        SELECT SUM(v) OVER (ORDER BY t
            RANGE BETWEEN INTERVAL 5 HOUR PRECEDING AND CURRENT ROW)
        FROM (VALUES (TIMESTAMP '2026-01-01 00:00:00', 1),
                     (TIMESTAMP '2026-01-01 05:00:00', 10),
                     (TIMESTAMP '2026-01-01 11:00:00', 100)) t(t, v)
        ORDER BY t
        """
        s = [r[0] for r in spark.sql(q_spark).collect()]
        d = [r[0] for r in duck.execute(q_duck).fetchall()]
        # row 2 (t=05:00) includes row 1 (exactly 5h back); row 3
        # (t=11:00) is 6h past row 2 -> alone
        assert s == [1, 11, 100] and d == [1, 11, 100]


class TestRound11bLevers:
    """Facts the round-11b additions rely on."""

    def test_anchored_regexp_matches_python_fullmatch(self, duck):
        """Lever for the remote-read oracles: DuckDB
        regexp_matches(x, '^(?:P)$') must agree with Python
        re.fullmatch(P, x) — PromQL matcher semantics — for the
        pattern shapes the queries use."""
        import re

        patterns = ["(click|error|s.*)", "p.*", "(view|purchase)", "click"]
        values = ["click", "clicked", "error", "signup", "purchase", "view", ""]
        for p in patterns:
            for v in values:
                want = re.fullmatch(p, v) is not None
                got = duck.execute(
                    "SELECT regexp_matches(?, ?)", [v, f"^(?:{p})$"]
                ).fetchone()[0]
                assert got == want, (p, v, got, want)

    def test_floor_of_double_rank_identical(self, spark, duck):
        """Lever for events_promql_quantile_agg: floor(phi*(n-1)) on
        IEEE doubles is identical cross-engine for the rank values in
        play (phi in {0.5, 0.9}, n up to thousands)."""
        for phi in (0.5, 0.9):
            for n in (1, 2, 3, 5, 7, 10, 101, 4096):
                s = spark.sql(
                    f"SELECT floor({phi}d * ({n} - 1)),"
                    f" {phi}d * ({n} - 1) - floor({phi}d * ({n} - 1))"
                ).first()
                d = duck.execute(
                    f"SELECT floor({phi}e0 * ({n} - 1)),"
                    f" {phi}e0 * ({n} - 1) - floor({phi}e0 * ({n} - 1))"
                ).fetchone()
                assert float(s[0]) == float(d[0]) and float(s[1]) == float(d[1])

    def test_holt_winters_step_identical_python_vs_duckdb(self, duck):
        """Lever for events_promql_holt_winters: one smoothing step —
        0.5*y + 0.5*(s+b) then 0.25*(s'−s) + 0.75*b — is bit-identical
        between Python floats and DuckDB doubles, so 720 chained steps
        stay bit-equal (exactness verified end-to-end in
        test_round11b_ops; this pins the primitive)."""
        import struct

        cases = [(3.0, 2.0, 1.0), (17.0, 4.5, 1.625), (1e15, 3.0, -2.0)]
        for y, s, b in cases:
            s_new = 0.5 * y + 0.5 * (s + b)
            b_new = 0.25 * (s_new - s) + 0.75 * b
            got = duck.execute(
                "SELECT 0.5e0*?+0.5e0*(?+?),"
                " 0.25e0*((0.5e0*?+0.5e0*(?+?))-?)+0.75e0*?",
                [y, s, b, y, s, b, s, b],
            ).fetchone()
            assert struct.pack("<d", s_new) == struct.pack("<d", float(got[0]))
            assert struct.pack("<d", b_new) == struct.pack("<d", float(got[1]))

    def test_extract_hour_matches_spark_hour(self, spark, duck):
        """General lever for hour-of-day derived series spellings:
        DuckDB EXTRACT(hour FROM ts) == Spark hour(ts) on UTC
        timestamps."""
        for ts in ("2024-01-05 00:30:00", "2024-01-05 13:59:59",
                   "2024-01-31 23:00:01"):
            s = spark.sql(f"SELECT hour(timestamp'{ts}')").first()[0]
            d = duck.execute(
                f"SELECT EXTRACT(hour FROM TIMESTAMP '{ts}')"
            ).fetchone()[0]
            assert int(s) == int(d), ts

    def test_epoch_ns_matches_unix_micros_x1000(self, spark, duck):
        """Lever for ingest_otlp_logs: DuckDB epoch_ns(ts) equals
        Spark unix_micros(ts)*1000 on µs-precision timestamps."""
        for ts in ("2024-01-05 00:30:00.123456", "1999-12-31 23:59:59.000001"):
            s = spark.sql(
                f"SELECT unix_micros(timestamp'{ts}') * 1000"
            ).first()[0]
            d = duck.execute(
                f"SELECT epoch_ns(TIMESTAMP '{ts}')"
            ).fetchone()[0]
            assert int(s) == int(d), ts
