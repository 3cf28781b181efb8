"""Edit-distance (fuzzy string) join — entity resolution without the
all-pairs cross product.

Finds every pair (l, r) with ``levenshtein(l, r) <= k`` between two
string columns. The scale path is q-gram PREFIX FILTERING (Gravano et
al., VLDB 2001 approximate string joins; the same signature principle
PPJoin uses for set overlap): strings within edit distance k share at
least ``max(|G_a|, |G_b|) - k*q`` positional q-grams, so keeping only
each string's ``k*q + 1`` globally-rarest grams as its signature is a
provably COMPLETE candidate generator — if two signatures are
disjoint, the pair cannot be within distance k. Candidates are one
equi-join on the signature grams; the exact levenshtein confirm runs
only on candidate pairs.

Correctness details that matter:

- The q-gram bound counts grams as a MULTISET. Signatures therefore
  annotate each gram with its occurrence index within the string
  (("abc", 1), ("abc", 2), ...): annotated-set intersection equals
  multiset overlap, so repeated-gram strings ("aaaa...") cannot slip
  through a set-semantics filter.
- Strings too short to carry a discriminating signature
  (``|G| <= k*q``, i.e. the overlap lower bound is vacuous) pair via a
  length-bucket EQUI-join: each short name explodes into its 2k+1
  admissible partner lengths and hash-joins the other side on exact
  length — the band ``|len(a) - len(b)| <= k`` is itself implied by
  edit distance, so this is complete, and there is no nested loop.
- The global gram order (frequency, then gram, then occurrence) is
  Spark-internal: any consistent total order is valid, nothing about
  it must match another engine.
- Both engines agree on levenshtein over ASCII; they diverge on
  non-ASCII (DuckDB counts bytes, Spark counts codepoints) — oracle
  parity is claimed for ASCII inputs only.

Scale shape: gram explode is map-side (×~len per string), the
frequency agg and signature build are one shuffle each on gram/name,
the candidate join shuffles signature rows (≤ k·q+1 per string), the
short-string branch is a (2k+1)-replicated equi-join on length, and
the confirm is candidate-bounded. No cross product anywhere.

Parity loci: SURVEY §3 row X8-ext (join family); [P: Gravano et al.
2001, "Approximate String Joins in a Database (Almost) for Free"].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_rows(names: DataFrame, q: int) -> DataFrame:
    """(name) -> (name, gram, occ): positional q-grams annotated with
    their occurrence index (multiset semantics)."""
    from pyspark.sql import Window

    grams = names.select(
        "name",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(name) - {q - 1}, 1)),"
                f" i -> substring(name, i, {q}))"
            )
        ).alias("pos", "gram"),
    ).where(F.length("gram") == q)
    w = Window.partitionBy("name", "gram").orderBy("pos")
    return grams.select(
        "name", "gram", F.row_number().over(w).alias("occ")
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int = 1,
    q: int = 3,
) -> DataFrame:
    """All (left_col, right_col, distance) pairs with
    ``levenshtein <= k``, computed via prefix-filtered q-gram blocking
    (module docstring). Distinct values join; callers re-attach ids by
    joining back on the string. Columns out: ``lname, rname, distance``.
    """
    sig_len = k * q + 1
    # a string is "short" when its gram multiset cannot beat the
    # overlap lower bound: |G| = len - q + 1 <= k*q
    short_len = q - 1 + k * q

    # Each side's distinct-name vocabulary feeds THREE consumers (the
    # long-string signature path, the short-string length buckets, and
    # the opposite side's length join); eager vocabulary-sized
    # checkpoints run the upstream derivation once per side instead of
    # once per consumer (observed: 14 scans / 26 exchanges without).
    lnames = (
        left.select(F.col(left_col).alias("name")).where(F.col("name").isNotNull()).distinct()
    ).localCheckpoint()
    rnames = (
        right.select(F.col(right_col).alias("name")).where(F.col("name").isNotNull()).distinct()
    ).localCheckpoint()

    univ = lnames.select("name", F.lit("L").alias("side")).unionByName(
        rnames.select("name", F.lit("R").alias("side"))
    )
    long_univ = univ.where(F.length("name") > short_len)
    grams = _gram_rows(long_univ.select("name").distinct(), q)
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("freq"))
    sig = (
        grams.join(freq, "gram")
        .groupBy("name")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("freq", "gram", "occ"))),
                1,
                sig_len,
            ).alias("sig")
        )
        .select("name", F.explode("sig").alias("s"))
        .select("name", F.col("s.gram").alias("gram"), F.col("s.occ").alias("occ"))
        # both join sides read the signature table: one gram pass
        .localCheckpoint()
    )
    sig_l = long_univ.where(F.col("side") == "L").join(sig, "name").select(
        F.col("name").alias("lname"), "gram", "occ"
    )
    sig_r = long_univ.where(F.col("side") == "R").join(sig, "name").select(
        F.col("name").alias("rname"), "gram", "occ"
    )
    cand = sig_l.join(sig_r, ["gram", "occ"]).select("lname", "rname")

    # short strings: signature bound is vacuous -> length-BUCKET
    # equi-join (not a nested loop): each short name explodes into its
    # 2k+1 admissible partner lengths and equi-joins the other side on
    # exact length. The length band |len(a)-len(b)| <= k is implied by
    # edit distance, so this is complete; replication is 2k+1 on the
    # short side only, and the plan is a hash/sort-merge join — at
    # 100 TB a short-name-heavy corpus pays |short|x(2k+1) join rows,
    # never |short|x|R| comparisons (r7 VERDICT task 4).
    short_l = lnames.where(F.length("name") <= short_len).select(
        F.col("name").alias("lname"),
        F.explode(
            F.sequence(F.length("name") - k, F.length("name") + k)
        ).alias("blen"),
    )
    short_r = rnames.where(F.length("name") <= short_len).select(
        F.col("name").alias("rname"),
        F.explode(
            F.sequence(F.length("name") - k, F.length("name") + k)
        ).alias("blen"),
    )
    r_by_len = rnames.select(
        F.col("name").alias("rname"), F.length("name").alias("blen")
    )
    l_by_len = lnames.select(
        F.col("name").alias("lname"), F.length("name").alias("blen")
    )
    cand = (
        cand.unionByName(short_l.join(r_by_len, "blen").select("lname", "rname"))
        .unionByName(l_by_len.join(short_r, "blen").select("lname", "rname"))
        .distinct()
    )

    return cand.where(
        (F.abs(F.length("lname") - F.length("rname")) <= k)
        & (F.levenshtein("lname", "rname") <= k)
    ).select(
        "lname", "rname", F.levenshtein("lname", "rname").cast("int").alias("distance")
    )
