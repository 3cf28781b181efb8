"""Language ID (operators/langid.py): discriminative capability on a
corpus with REAL per-language character signal, determinism of the
integer profile arithmetic, and a sanity pass over the testdata
(whose lang labels are text-independent — accuracy there is prior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricproxy_spark.operators.langid import (
    classify_language,
    train_trigram_profiles,
)

# Small parallel corpus with genuine per-language character
# distributions (accents / umlauts / CJK / ñ) — public pangram-style
# filler, NOT the testdata vocabulary.
_CORPUS = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a stitch in time saves nine and the early bird catches the worm",
        "all that glitters is not gold but every cloud has a silver lining",
        "actions speak louder than words when push comes to shove",
    ],
    "fr": [
        "portez ce vieux whisky au juge blond qui fume sa pipe très tôt",
        "le cœur a ses raisons que la raison ne connaît point du tout",
        "après la pluie le beau temps arrive toujours à qui sait attendre",
        "il ne faut pas vendre la peau de l'ours avant de l'avoir tué",
    ],
    "de": [
        "zwölf boxkämpfer jagen viktor quer über den großen sylter deich",
        "übung macht den meister und aller anfang ist bekanntlich schwer",
        "wer zuletzt lacht lacht am besten sagte die kluge müllerin",
        "morgenstund hat gold im mund aber müßiggang ist aller laster anfang",
    ],
    "es": [
        "el veloz murciélago hindú comía feliz cardillo y kiwi en la mañana",
        "más vale pájaro en mano que ciento volando por el cañón del río",
        "a quien madruga dios le ayuda pero no por mucho madrugar amanece",
        "en boca cerrada no entran moscas ni pequeños problemas añejos",
    ],
    "zh": [
        "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少",
        "床前明月光疑是地上霜举头望明月低头思故乡",
        "白日依山尽黄河入海流欲穷千里目更上一层楼",
        "千山鸟飞绝万径人踪灭孤舟蓑笠翁独钓寒江雪",
    ],
}


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [
        (1000 * li + di, lang, text)
        for li, (lang, texts) in enumerate(sorted(_CORPUS.items()))
        for di, text in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestLangId:
    def test_discriminative_corpus_high_accuracy(self, spark, corpus_df):
        """Training-set accuracy on a corpus with real character
        signal: every doc must classify to its own language (distinct
        charsets/diacritics make the profiles far apart)."""
        model = train_trigram_profiles(corpus_df)
        pred = classify_language(corpus_df, model)
        got = {
            r.doc_id: r.lang_pred
            for r in pred.collect()
        }
        want = {r.doc_id: r.lang for r in corpus_df.collect()}
        acc = sum(got[k] == want[k] for k in want) / len(want)
        assert acc >= 0.9, (acc, got)

    def test_holdout_generalizes(self, spark, corpus_df):
        """Leave-one-doc-out per language: held-out docs still
        classify correctly from the other three docs' profiles."""
        train = corpus_df.where(F.col("doc_id") % 1000 != 0)
        test = corpus_df.where(F.col("doc_id") % 1000 == 0)
        model = train_trigram_profiles(train)
        pred = classify_language(test, model)
        rows = pred.join(test.select("doc_id", "lang"), "doc_id").collect()
        acc = sum(r.lang_pred == r.lang for r in rows) / len(rows)
        assert acc >= 0.8, rows

    def test_weights_are_bounded_integers(self, spark, corpus_df):
        """Per-million weights are integers in [0, 1e6] regardless of
        corpus size — the BIGINT-safety invariant at scale."""
        model = train_trigram_profiles(corpus_df)
        mx, mn = model.agg(F.max("r"), F.min("r")).first()
        assert 0 <= mn and mx <= 1_000_000
        assert dict(model.dtypes)["r"] == "bigint"

    def test_tie_break_deterministic(self, spark):
        """Identical training text for two labels -> identical scores;
        argmax must break lang-ascending, not arbitrarily."""
        df = spark.createDataFrame(
            [(0, "aa", "same text here"), (1, "bb", "same text here")],
            "doc_id long, lang string, text string",
        )
        model = train_trigram_profiles(df)
        pred = classify_language(df, model)
        assert {r.lang_pred for r in pred.collect()} == {"aa"}

    def test_short_docs_absent(self, spark, corpus_df):
        """Documents under 3 chars have no trigrams and are absent —
        callers length-gate first; absence, not a wrong guess."""
        model = train_trigram_profiles(corpus_df)
        short = spark.createDataFrame(
            [(7, "en", "ab")], "doc_id long, lang string, text string"
        )
        assert classify_language(short, model).count() == 0

    def test_sub3_char_texts_emit_zero_grams(self, spark):
        """Regression (round-9 ADVICE): sequence(1, greatest(n-2, 0))
        yields Spark's descending [1, 0] for n <= 2 and emitted two
        phantom sub-3-char 'trigrams' ('ab' -> ['ab', 'ab']); the
        explicit empty-array guard must emit none, and training on a
        short-doc corpus must not corrupt model counts."""
        from metricproxy_spark.operators.langid import _trigrams

        df = spark.createDataFrame(
            [(0, "en", ""), (1, "en", "a"), (2, "en", "ab"), (3, "en", "abc")],
            "doc_id long, lang string, text string",
        )
        grams = _trigrams(df.selectExpr("doc_id", "text as t"), ["doc_id"], "t")
        rows = grams.collect()
        assert [(r.doc_id, r.gram) for r in rows] == [(3, "abc")]
        model = train_trigram_profiles(df)
        assert [(r.lang, r.gram) for r in model.collect()] == [("en", "abc")]

    def test_testdata_sanity(self, spark, sf_dir):
        """On the synthetic testdata the lang labels are independent
        of the text (single shared vocabulary — verified in round 8),
        so accuracy sits near the class prior; assert only that the
        pipeline runs, covers every doc, and emits known labels."""
        from metricproxy_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        model = train_trigram_profiles(docs)
        pred = classify_language(docs, model)
        n_docs = docs.count()
        rows = pred.join(docs.select("doc_id", "lang"), "doc_id").collect()
        assert len(rows) == n_docs
        langs = {r.lang for r in rows}
        assert {r.lang_pred for r in rows} <= langs
        acc = sum(r.lang_pred == r.lang for r in rows) / len(rows)
        assert acc >= 0.10  # >= chance-ish; labels carry no signal


class TestProportionalAllocation:
    def test_alloc_sums_to_budget_and_bounds(self, spark, sf_dir):
        """Largest-remainder apportionment invariants: Σalloc == T
        exactly, and every stratum gets floor or floor+1 of its
        exact quota."""
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        rows = QUERIES["pipeline_proportional_allocation"](
            spark, sf_dir
        ).collect()
        total_docs = sum(r.n_docs for r in rows)
        assert sum(r.alloc for r in rows) == 1000
        for r in rows:
            base = (1000 * r.n_docs) // total_docs
            assert r.alloc in (base, base + 1), r
