"""Deduplication operators (SURVEY §3.8 L1/L2): exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design (the whole point of these shapes at 100 TB):

- exact dedup groups on a 256-bit digest of normalized text, never on
  the text itself — the shuffle carries 32 bytes + id per row.
- MinHash/LSH finds near-dup *candidates* without the O(n²) pair space:
  signature is per-row (narrow), banding explodes each row into B
  small keys, and only rows sharing a band bucket ever meet in a join.
  Verification (exact Jaccard) runs on candidates only.
- SimHash packs a document into one int64; banding on 16-bit chunks
  gives hamming-distance blocking with the same candidate-join shape.

Everything is Catalyst builtins + higher-order functions — no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """L1: one survivor (min id) per normalized-text digest.

    Returns (kept_<id_col>, n_copies). Collision note: sha2-256 makes
    same-digest ≡ same-text at any realistic corpus size.
    """
    key = F.sha2(normalized_text(text_col), 256)
    return (
        df.groupBy(key.alias("_text_key"))
        .agg(
            F.min(id_col).alias(f"kept_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_text_key")
    )


def word_shingles(text_col: Column | str, k: int = 3) -> Column:
    """Word-level k-shingles as strings ('w1 w2 w3'); documents shorter
    than k words yield their whole text as the single shingle."""
    words = F.split(normalized_text(text_col), " ")
    n = F.size(words)
    return F.when(n < k, F.array(F.array_join(words, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),  # n-k+1 shingles
            lambda i: F.array_join(F.slice(words, i + 1, k), " "),
        )
    )


def _seeded_hash(seed: int):
    # NB: must stay a ONE-parameter lambda — a second (default) param
    # would make transform() bind the array index to it.
    return lambda s: F.xxhash64(s, F.lit(seed))


def minhash_signature(
    shingles: Column, num_hashes: int = 16
) -> Column:
    """MinHash signature: element i = min over shingles of a seeded
    64-bit hash. Permutation family = xxhash64 with the seed as a
    second hashed column (independent enough for LSH banding)."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_hash(i)))
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Explodeable array of (band_index, band_hash) structs."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        "_",
                        *[
                            F.get(signature, b * rows_per_band + r).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def jaccard(words_a: Column, words_b: Column) -> Column:
    """Exact Jaccard over distinct word sets (verification metric)."""
    inter = F.size(F.array_intersect(words_a, words_b))
    union = F.size(F.array_union(words_a, words_b))
    return inter.cast("double") / union.cast("double")


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """L2: full MinHash→LSH→verify pipeline.

    Returns (id_a, id_b, jaccard) for candidate pairs whose exact
    Jaccard ≥ threshold. Cost profile: one narrow pass to signatures,
    explode ×bands, one shuffle on the band key, join only inside
    buckets, verify only candidates.
    """
    rows_per_band = num_hashes // bands
    words = F.array_distinct(F.split(normalized_text(text_col), " "))
    sig = minhash_signature(word_shingles(text_col, k_shingle), num_hashes)
    tagged = df.select(
        F.col(id_col).alias("_id"),
        words.alias("_words"),
        F.explode(lsh_band_keys(sig, bands, rows_per_band)).alias("_bk"),
    ).select("_id", "_words", "_bk.band", "_bk.band_hash")

    a = tagged.alias("a")
    b = tagged.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._words").alias("_wa"),
            F.col("b._words").alias("_wb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("jaccard", jaccard(F.col("_wa"), F.col("_wb")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(text_col: Column | str, num_bits: int = 64) -> Column:
    """SimHash: bit b set iff more than half the word hashes have bit b
    set. One int64 per document, pure higher-order functions."""
    hashes = F.transform(
        F.array_distinct(F.split(normalized_text(text_col), " ")),
        lambda w: F.xxhash64(w),
    )
    n = F.size(hashes)

    def bit_set(b: int):
        # one-param lambda (see _seeded_hash note)
        return lambda h: F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1

    bit = lambda b: F.when(  # noqa: E731
        F.size(F.filter(hashes, bit_set(b))) * 2 > n,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    out = F.lit(0).cast("long")
    for b in range(num_bits):
        out = out + F.shiftleft(bit(b), b)
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
) -> DataFrame:
    """L2 (SimHash flavor): candidate pairs via 16-bit band blocking
    (a pair within hamming distance ≤ 3 must agree on ≥1 of 4 bands;
    wider distances trade recall for the same bounded cost), verified
    with exact popcount of the XOR."""
    sh = df.select(
        F.col(id_col).alias("_id"), simhash(text_col).alias("_sim")
    )
    banded = sh.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_bk"),
    ).select("_id", "_sim", "_bk.band", "_bk.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(
                F.col("a._sim").bitwiseXOR(F.col("b._sim"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
