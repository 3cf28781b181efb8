"""Distributed BPE tokenizer training (SURVEY §3.8 L4 extension — the
tokenizer-fitting half of a training-data pipeline).

Byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016): start from
characters (plus an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair. The classic scale trick applies: after
ONE pass over the corpus to count words, training iterates on the
WORD-VOCABULARY (distinct words × counts), which is orders of
magnitude smaller than the corpus — 100 TB of text, a few million
distinct words.

Scale shape per merge round:

- pair counting = posexplode(zip(syms, syms[1:])) → groupBy(pair)
  weighted sum — hash agg with map-side combine over the vocab;
- the argmax pair is ONE collected row (deterministic tie-break:
  highest count, then lexicographic pair);
- the merge applies to the vocab via one narrow mapInPandas pass;
- vocab re-persists each round and the previous round unpersists
  (the connected-components lineage pattern), so state on the
  cluster stays vocab-sized and lineage stays flat.

Driver state: the merge table (n_merges pairs) — nothing else.

Determinism: no RNG anywhere; ties on pair counts break
lexicographically, so the merge sequence is a pure function of the
corpus. Iterative fixpoint ⇒ rows-only driver check; the known-corpus
merge sequence and compression property are unit-tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass: (word, count) for every distinct whitespace
    word of lower(trim(text)) — the only stage that touches the
    full data."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_syms(vocab: DataFrame) -> DataFrame:
    """word → its character sequence + end-of-word marker."""
    return vocab.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(_EOW))
        ).alias("syms"),
    )


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word count: zip_with over the
    shifted symbol array, explode, hash agg (map-side combined)."""
    pairs = syms_df.select(
        "cnt",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("l"), F.col("p.r").alias("r")
    ).agg(F.sum("cnt").alias("pair_cnt"))


def _apply_merge(syms_df: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) with the fused symbol —
    left-to-right greedy, the standard BPE application order. Narrow
    mapInPandas over the vocab."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fused = left + right
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(fused)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "syms": out}
            )

    return syms_df.mapInPandas(gen, "word string, cnt long, syms array<string>")


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges. Returns the merge table:
    [{rank, left, right, pair_cnt}] in learned order."""
    syms = _init_syms(word_vocab(docs, text_col)).persist()
    syms.count()  # materialize before iterating
    merges: list[dict] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(
                F.col("pair_cnt").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_cnt"] < 2:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["pair_cnt"])
        merges.append({"rank": rank, "left": l, "right": r, "pair_cnt": c})
        nxt = _apply_merge(syms, l, r).persist()
        nxt.count()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge table: (id, n_words,
    n_tokens). One narrow mapInPandas pass — the merge table rides in
    the closure (driver-bounded, like a broadcast dim)."""
    ordered = [(m["left"], m["right"]) for m in sorted(merges, key=lambda m: m["rank"])]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def encode_word(word: str) -> int:
            s = list(word) + [_EOW]
            for left, right in ordered:
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                s = res
            return len(s)

        for pdf in batches:
            n_words, n_tokens = [], []
            for text in pdf[text_col]:
                ws = [w for w in ("" if text is None else text).strip().lower().split() if w]
                n_words.append(len(ws))
                n_tokens.append(sum(encode_word(w) for w in ws))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_words": n_words, "n_tokens": n_tokens}
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, n_words bigint, n_tokens bigint"
    )
