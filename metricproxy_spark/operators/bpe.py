"""Distributed BPE tokenizer training (SURVEY §3.8 L4 extension — the
tokenizer-fitting half of a training-data pipeline).

Byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016): start from
characters (plus an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair. The classic scale trick applies: after
ONE pass over the corpus to count words, training iterates on the
WORD-VOCABULARY (distinct words × counts), which is orders of
magnitude smaller than the corpus — 100 TB of text, a few million
distinct words.

Scale shape per merge ROUND (standard frequency batching — see e.g.
the batched trainers in SentencePiece/tokenizers):

- pair counting = explode(zip(syms, syms[1:])) → groupBy(pair)
  weighted sum — hash agg with map-side combine over the vocab;
- the top candidate pairs are ONE small collected slice
  (deterministic tie-break: highest count, then lexicographic pair);
- up to ``batch_size`` mutually NON-INTERACTING pairs (disjoint
  symbol sets, including each pair's fused symbol) are picked
  greedily from that slice — disjointness makes the batch exact:
  applying one picked merge cannot change another picked pair's
  adjacency count, so the recorded counts equal what one-at-a-time
  training would have seen for those pairs;
- all picked merges apply in ONE narrow mapInPandas pass;
- vocab re-persists each round and the previous round unpersists
  (the connected-components lineage pattern), so state on the
  cluster stays vocab-sized and lineage stays flat.

Driver round-trips therefore scale as vocab_size / batch_size, not
vocab_size — the fix for the "32k merges = 32k Spark jobs" driver
bottleneck. ``batch_size=1`` degenerates to the classic Sennrich
sequence exactly. With batching, the SEQUENCE may differ from
one-at-a-time training (a fused pair such as ('es','t') only becomes
visible the round after ('e','s') merges) — the standard, documented
trade of every batched BPE trainer.

Driver state: the merge table (n_merges pairs) — nothing else.

Determinism: no RNG anywhere; ties on pair counts break
lexicographically, so the merge sequence is a pure function of the
corpus and batch_size. Iterative fixpoint ⇒ rows-only driver check;
the known-corpus merge sequence and compression property are
unit-tested.
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


def _apply_merges(
    syms_df: DataFrame, batch: list[tuple[str, str]]
) -> DataFrame:
    """Replace every adjacent (left, right) of each pair in ``batch``
    with its fused symbol — left-to-right greedy, the standard BPE
    application order. The batch is mutually non-interacting (disjoint
    symbol sets), so within-pass application order is irrelevant. One
    narrow mapInPandas over the vocab for the WHOLE batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                for left, right in batch:
                    fused = left + right
                    res = []
                    i = 0
                    n = len(s)
                    while i < n:
                        if i + 1 < n and s[i] == left and s[i + 1] == right:
                            res.append(fused)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    s = res
                out.append(s)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "syms": out}
            )

    return syms_df.mapInPandas(gen, "word string, cnt long, syms array<string>")


def _pick_noninteracting(
    cands: list, want: int
) -> list[tuple[str, str, int]]:
    """Greedy scan of count-ordered candidates: accept a pair iff its
    symbol triple {l, r, l+r} is disjoint from every accepted pair's
    triple. Disjointness ⇒ the accepted merges commute AND their
    pre-round counts are exact."""
    used: set[str] = set()
    picked: list[tuple[str, str, int]] = []
    for row in cands:
        if len(picked) >= want:
            break
        l, r, c = row["l"], row["r"], int(row["pair_cnt"])
        if c < 2:
            break
        trip = {l, r, l + r}
        if trip & used:
            continue
        picked.append((l, r, c))
        used |= trip
    return picked


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    batch_size: int = 1,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges, up to ``batch_size`` per Spark
    round (driver round-trips ~ n_merges / batch_size). Returns the
    merge table [{rank, left, right, pair_cnt}] in learned order;
    ``batch_size=1`` reproduces the classic one-at-a-time sequence."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    spark = docs.sparkSession
    # The loop's frames are VOCAB-sized (distinct words), not
    # corpus-sized: scope the shuffle width to that key cardinality for
    # the duration of training (restored after), the same state-sized
    # partitioning rule the stateful-stream and k-means trainers apply.
    # A session default sized for fact-table shuffles spins dozens of
    # near-empty tasks (plus a Python worker each for the mapInPandas
    # merge pass) for every round. Results are partition-independent
    # (hash aggs + per-row map); at real scale the job sets this from
    # expected vocab volume.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _train_bpe_merges_scoped(docs, text_col, n_merges, batch_size)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _train_bpe_merges_scoped(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    batch_size: int,
) -> list[dict]:
    # ONE Spark action per merge round: the candidate collect itself
    # materializes the freshly-persisted vocab (first action on a
    # persisted frame computes AND caches it), so the separate
    # count() materialization jobs — one per round plus one for the
    # init — are pure overhead and are gone. The superseded round's
    # cache unpersists only AFTER the next round's collect has
    # materialized its successor (unpersisting earlier would force the
    # successor to recompute its parent from scratch). The final
    # batch's merge application is skipped entirely: nothing downstream
    # reads the post-final vocab — train returns only the merge table.
    syms = _init_syms(word_vocab(docs, text_col)).persist()
    prev: DataFrame | None = None
    merges: list[dict] = []
    while len(merges) < n_merges:
        want = min(batch_size, n_merges - len(merges))
        # over-fetch: interacting candidates get skipped, so pull a
        # few× the batch (still one small driver collect)
        cands = (
            _pair_counts(syms)
            .orderBy(
                F.col("pair_cnt").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(max(8, 4 * want))
            .collect()
        )
        if prev is not None:  # superseded round, now safe to release
            prev.unpersist()
            prev = None
        picked = _pick_noninteracting(cands, want)
        if not picked:
            break
        for l, r, c in picked:
            merges.append(
                {"rank": len(merges), "left": l, "right": r, "pair_cnt": c}
            )
        if len(merges) >= n_merges:
            break  # done: never apply (or compute) the final batch
        prev = syms
        syms = _apply_merges(syms, [(l, r) for l, r, _ in picked]).persist()
    syms.unpersist()
    if prev is not None:
        prev.unpersist()
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
