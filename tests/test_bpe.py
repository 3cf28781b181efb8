"""BPE trainer (operators/bpe.py): known-corpus merge sequence,
determinism, and the compression invariant of applying merges."""

from __future__ import annotations

from metricproxy_spark.operators.bpe import (
    apply_bpe,
    train_bpe_merges,
    word_vocab,
)


def _corpus(spark):
    # the classic Sennrich-style toy corpus: 'lo' then 'low' dominate
    return spark.createDataFrame(
        [
            (0, "low low low low low"),
            (1, "lower lower"),
            (2, "newest newest newest newest newest newest"),
            (3, "widest widest widest"),
        ],
        "doc_id long, text string",
    )


def test_merge_sequence_known_corpus(spark):
    m = train_bpe_merges(_corpus(spark), n_merges=4)
    got = [(x["left"], x["right"], x["pair_cnt"]) for x in m]
    # e+s appears in newest(6)+widest(3)=9 — the top pair; then es+t 9,
    # then est+</w> 9; then l+o in low(5)+lower(2)=7
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
    ]


def test_determinism_and_vocab_counts(spark):
    a = train_bpe_merges(_corpus(spark), n_merges=6)
    b = train_bpe_merges(_corpus(spark), n_merges=6)
    assert a == b
    vocab = {r["word"]: r["cnt"] for r in word_vocab(_corpus(spark)).collect()}
    assert vocab == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_apply_compresses_monotonically(spark):
    docs = _corpus(spark)
    m6 = train_bpe_merges(docs, n_merges=6)
    chars = {
        r.doc_id: r.n_tokens for r in apply_bpe(docs, []).collect()
    }
    toks = {
        r.doc_id: r.n_tokens for r in apply_bpe(docs, m6).collect()
    }
    assert all(toks[d] < chars[d] for d in chars)  # merges compress
    # with zero merges every word is chars+1 tokens
    words = {r.doc_id: r.n_words for r in apply_bpe(docs, []).collect()}
    lens = {0: 5 * 3, 1: 2 * 5, 2: 6 * 6, 3: 3 * 6}  # Σ word chars
    assert {d: lens[d] + words[d] for d in lens} == chars


def test_batched_training_fewer_rounds_same_quality(spark, monkeypatch):
    """batch_size=4 must learn >=8 merges in <=3 Spark rounds (the
    driver-round-trip fix: rounds ~ n_merges/batch_size, not n_merges)
    with compression still monotone in the merge prefix."""
    import metricproxy_spark.operators.bpe as bpe_mod

    rounds = {"n": 0}
    real_apply = bpe_mod._apply_merges

    def counting_apply(syms_df, batch):
        rounds["n"] += 1
        assert 1 <= len(batch) <= 4
        return real_apply(syms_df, batch)

    monkeypatch.setattr(bpe_mod, "_apply_merges", counting_apply)
    docs = _corpus(spark)
    merges = bpe_mod.train_bpe_merges(docs, n_merges=8, batch_size=4)
    assert len(merges) >= 8
    assert rounds["n"] <= 3
    assert [m["rank"] for m in merges] == list(range(len(merges)))
    # batched pairs within a round are mutually non-interacting
    # (disjoint symbol triples) — re-check from the recorded table
    prev = None
    for upto in range(len(merges) + 1):
        toks = {
            r.doc_id: r.n_tokens
            for r in apply_bpe(docs, merges[:upto]).collect()
        }
        if prev is not None:
            assert all(toks[d] <= prev[d] for d in toks)
        prev = toks


def test_batched_batch1_degenerates_to_classic_sequence(spark):
    a = train_bpe_merges(_corpus(spark), n_merges=4, batch_size=1)
    b = train_bpe_merges(_corpus(spark), n_merges=4)
    assert a == b
    assert [(x["left"], x["right"]) for x in a] == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
    ]


def test_real_corpus_runs_and_is_deterministic(spark, sf_dir):
    from metricproxy_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    m = train_bpe_merges(docs, n_merges=3)
    assert len(m) == 3
    assert m == train_bpe_merges(docs, n_merges=3)


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abno", min_size=1, max_size=4)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_property_merges_compress_monotonically(spark, texts):
    """On arbitrary corpora: every additional merge can only shrink (or
    keep) each document's token count, and no document compresses below
    one token per word."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = train_bpe_merges(docs, n_merges=4)
    prev = None
    for upto in range(len(merges) + 1):
        toks = {
            r.doc_id: r.n_tokens
            for r in apply_bpe(docs, merges[:upto]).collect()
        }
        words = {
            r.doc_id: r.n_words for r in apply_bpe(docs, []).collect()
        }
        assert all(toks[d] >= max(words[d], 1) for d in toks)
        if prev is not None:
            assert all(toks[d] <= prev[d] for d in toks)
        prev = toks
