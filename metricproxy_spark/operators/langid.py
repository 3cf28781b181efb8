"""In-pipeline language identification — character-trigram frequency
profiles, fully integer, trained and applied in one Spark plan.

The classifier is the frequency-profile family (Cavnar & Trenkle 1994
"N-Gram-Based Text Categorization" is the public ancestor): each
language's model is its per-MILLION character-trigram frequency
``R[t, lang] = (count[t, lang] * 1_000_000) div total[lang]`` — an
INTEGER, so training is exact in any engine — and a document's score
for a language is ``sum_t n_t * R[t, lang]`` over the document's own
trigram multiset, another exact integer. Prediction is argmax with a
deterministic lang-ascending tie-break. No logs, no floats anywhere:
the whole train + score + argmax chain is SQL-expressible and
hash-exact across engines (the PMI/Benford integer-ratio discipline).

Design notes:

- Per-million normalization makes profiles CLASS-SIZE invariant (a
  language with 10x the training text does not dominate), and bounds
  every weight by 1e6 regardless of corpus size — document scores fit
  BIGINT at any scale (len(doc) * 1e6).
- Features are raw trigrams, not hashed buckets: the char-trigram
  space is intrinsically bounded by |charset|^3, so the model is
  broadcast-sized by construction and feature hashing would only add
  a collision term without shrinking anything that matters.
- Trigrams that a document shares with NO training language simply
  contribute nothing (inner join); a document under 3 chars has no
  trigrams and is absent from the output — callers gate on length
  first (quality gates already do).

Scale shape: trigram explode is map-side (~len(text) rows per doc);
the model is two hash aggs over (lang, gram) — at most |charset|^3 x L
rows — then BROADCAST to score documents, so scoring is one map-side
join + one hash agg on (doc, lang) + a 5-row-per-doc argmax window.
No driver materialization; the model never leaves the cluster.

Parity loci: SURVEY §3 row L4 (text analysis); [P: Cavnar & Trenkle
1994 n-gram profiles].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000  # per-million integer frequency


def _trigrams(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """Explode lower-cased character trigrams (map-side).

    ``lower()`` is projected ONCE per row before the transform lambda:
    referenced inline it is (re-)evaluated inside the per-element
    lambda, turning the explode O(len^2) in characters per document."""
    low = df.select(
        *id_cols, F.lower(F.col(text_col)).alias("_tl")
    )
    return low.select(
        *id_cols,
        F.explode(
            F.expr(
                "transform(CASE WHEN length(_tl) >= 3"
                " THEN sequence(1, length(_tl) - 2)"
                " ELSE array() END,"
                " i -> substring(_tl, i, 3))"
            )
        ).alias("gram"),
    )


def train_trigram_profiles(
    df: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """One-pass training: (lang, gram, r) with r = per-million integer
    trigram frequency within the language."""
    grams = _trigrams(
        df.select(F.col(label_col).alias("lang"), F.col(text_col).alias("t")),
        ["lang"],
        "t",
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("lang").agg(F.sum("c").alias("t"))
    return counts.join(F.broadcast(totals), "lang").select(
        "lang",
        "gram",
        F.expr(f"CAST(c * {SCALE} DIV t AS BIGINT)").alias("r"),
    )


def classify_language(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every language profile and argmax.
    Output: (id_col, lang_pred, top_score). Ties break lang-ascending
    (deterministic)."""
    docg = (
        _trigrams(
            docs.select(F.col(id_col), F.col(text_col).alias("t")),
            [id_col],
            "t",
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scores = (
        docg.join(F.broadcast(model), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("n") * F.col("r")).cast("bigint").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            id_col,
            F.col("lang").alias("lang_pred"),
            F.col("score").alias("top_score"),
        )
    )


def langid_end_to_end(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Train-on-self + classify in ONE trigram pass — the shape the
    registered query runs (train corpus == scoring corpus): the
    (doc, gram) counts are computed once and the per-language model is
    DERIVED from them via a broadcast doc->label join, instead of
    exploding the corpus a second time. Output matches
    train_trigram_profiles + classify_language exactly."""
    docg = (
        _trigrams(
            docs.select(F.col(id_col), F.col(text_col).alias("t")),
            [id_col],
            "t",
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # (doc, gram) counts feed BOTH the model derivation and the scoring
    # join; without a materialization the corpus-wide explode + agg
    # re-executes per consumer (3x total — the model subtree reads it
    # twice through counts). One eager localCheckpoint pins it — the
    # standard iterative-reuse lineage cut used across this repo;
    # fingerprint-sized (ids + grams + counts), never raw text.
    docg = docg.localCheckpoint(eager=True)
    labels = docs.select(id_col, F.col(label_col).alias("lang"))
    counts = (
        docg.join(F.broadcast(labels), id_col)
        .groupBy("lang", "gram")
        .agg(F.sum("n").alias("c"))
    )
    totals = counts.groupBy("lang").agg(F.sum("c").alias("t"))
    model = counts.join(F.broadcast(totals), "lang").select(
        "lang", "gram", F.expr(f"CAST(c * {SCALE} DIV t AS BIGINT)").alias("r")
    )
    scores = (
        docg.join(F.broadcast(model), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("n") * F.col("r")).cast("bigint").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            id_col,
            F.col("lang").alias("lang_pred"),
            F.col("score").alias("top_score"),
        )
    )
