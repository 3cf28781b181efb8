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
    second hashed column (independent enough for LSH banding).

    ``shingles`` may be the shingle STRINGS or already base-hashed
    BIGINTs: callers at scale stage ``transform(sh, xxhash64)`` once
    so the num_hashes seeded permutations re-hash 8-byte ints instead
    of re-reading every shingle string num_hashes× — same
    independence, ~an order less hashed bytes (the standard
    one-base-hash MinHash layout)."""
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
    # Staged projections, NOT one inline expression tree: Catalyst's
    # CollapseProject refuses to merge projections when it would
    # duplicate a non-cheap expression, so each stage below is computed
    # exactly once per row. Built inline, the band keys would re-embed
    # the signature 16x and the signature re-embeds the shingle array
    # 16x — a ~256x per-row blowup we measured at 59s for 5k docs.
    words_df = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.split(normalized_text(text_col), " ")).alias(
            "_words"
        ),
        word_shingles(text_col, k_shingle).alias("_sh"),
    )
    # Base-hash each shingle string ONCE (its own staged projection —
    # CollapseProject would otherwise inline it back 16×), then the
    # seeded permutations hash 8-byte ints.
    hashed_df = words_df.select(
        "_id",
        "_words",
        F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_shh"),
    )
    sig_df = hashed_df.select(
        "_id",
        "_words",
        minhash_signature(F.col("_shh"), num_hashes).alias("_sig"),
    )
    # Four consumers read this frame (both band-join sides + both
    # verify rejoin sides): one eager checkpoint runs the shingle →
    # xxhash64 → 16-permutation signature pass ONCE instead of once per
    # consumer. The checkpointed rows are (id, distinct words, 16
    # int64s) — the same data that would cross the wire anyway.
    sig_df = sig_df.localCheckpoint(eager=True)
    # The band-bucket join only needs (id, band, band_hash): keep the
    # shuffle narrow; word arrays rejoin after candidate dedup. At scale
    # the heavy arrays thus cross the wire once per *candidate*, not
    # once per (row x band).
    banded = sig_df.select(
        "_id",
        F.explode(
            lsh_band_keys(F.col("_sig"), bands, rows_per_band)
        ).alias("_bk"),
    ).select("_id", "_bk.band", "_bk.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    wa = sig_df.select(F.col("_id").alias("id_a"), F.col("_words").alias("_wa"))
    wb = sig_df.select(F.col("_id").alias("id_b"), F.col("_words").alias("_wb"))
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .withColumn("jaccard", jaccard(F.col("_wa"), F.col("_wb")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 15,
) -> DataFrame:
    """Distributed connected components by min-label propagation — the
    step that turns near-dup *pairs* into dedup *clusters* (keep
    min-id per component, drop the rest).

    Each iteration: every node takes min(own label, neighbors' labels);
    converged when no label changes. Iterations needed = component
    diameter (near-dup clusters are dense, so a handful); each
    iteration is one join + one aggregation, fully distributed, with
    ``localCheckpoint`` truncating the lineage so the plan doesn't grow
    across iterations (the standard Spark iterative pattern — same
    shape GraphX/GraphFrames CC uses). The per-iteration convergence
    count is a deliberate driver-side scalar, not a data collect.

    Returns (``id_col``, component_id) for every node (singletons map
    to themselves).

    Only edge-incident nodes enter the iteration: a node with no edges
    can never change its label, so looping over it is pure waste — and
    in dedup graphs singletons dominate (most documents have no
    near-duplicate). Iteration cost scales with |edge endpoints|, not
    |corpus|; singletons rejoin via one anti-join at the end
    (measured 16s → ~6s on the sf0.1 near-dup graph).
    """
    # Materialize the (possibly expensive) edges subtree ONCE — a
    # union of two selects would re-execute its final stage per branch
    # (exchange reuse stops at the last shuffle), which doubled the
    # near-dup pairs join cost when edges came straight off
    # prefix_similarity_join. The symmetric view is then a narrow
    # explode over the checkpoint — no dedup shuffle needed, since
    # forward+reverse images of distinct undirected edges are
    # automatically distinct (duplicates would only pad the min-agg
    # anyway).
    edges_ckpt = edges.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    ).localCheckpoint(eager=True)
    sym = edges_ckpt.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_a").alias("_src"), F.col("_b").alias("_dst")
                ),
                F.struct(
                    F.col("_b").alias("_src"), F.col("_a").alias("_dst")
                ),
            )
        ).alias("_e")
    ).select("_e._src", "_e._dst")
    # Symmetric closure ⇒ every incident node appears as a _src.
    labels = (
        sym.select(F.col("_src").alias("_nid"))
        .dropDuplicates(["_nid"])
        .select("_nid", F.col("_nid").alias("_label"))
        .localCheckpoint(eager=True)
    )
    # When the incident-node set is modest, broadcast the label table
    # each iteration: the (large) edge list then never shuffles — each
    # iteration is one narrow scan of the edges checkpoint + map-side
    # partial min-agg. Past the broadcast budget (huge graphs) fall
    # back to the shuffle join, which is the scalable default.
    bcast = labels.count() <= 2_000_000
    ckpt = labels  # the actual checkpointed frame (unpersist target)
    for _ in range(max_iter):
        lab = F.broadcast(labels) if bcast else labels
        neighbor_min = (
            sym.join(lab, sym["_src"] == labels["_nid"])
            .groupBy("_dst")
            .agg(F.min("_label").alias("_nmin"))
        )
        if bcast:
            neighbor_min = F.broadcast(neighbor_min)
        # The convergence flag rides in the same projection, so the
        # "did anything change" check is a filter-count over the
        # freshly checkpointed frame — no extra old-vs-new join pass.
        new_ckpt = (
            labels.join(
                neighbor_min, labels["_nid"] == neighbor_min["_dst"], "left"
            )
            .select(
                "_nid",
                F.least(
                    F.col("_label"), F.coalesce("_nmin", F.col("_label"))
                ).alias("_label"),
                F.coalesce(
                    F.col("_nmin") < F.col("_label"), F.lit(False)
                ).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_ckpt.filter("_chg").count()
        # Release the superseded iteration's checkpoint blocks — they
        # otherwise stay pinned for the session and starve later
        # queries' cache (measured: +8s on the next heavy query).
        ckpt.unpersist()
        ckpt = new_ckpt
        labels = new_ckpt.drop("_chg")
        if changed == 0:
            break
    # The edges checkpoint is only needed during the loop; the
    # returned labels are self-contained (their own checkpoint).
    edges_ckpt.unpersist()
    incident = labels.select(
        F.col("_nid").alias(id_col), F.col("_label").alias("component_id")
    )
    singletons = (
        nodes.select(F.col(id_col))
        .join(incident.select(id_col), id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("component_id"))
    )
    return incident.unionByName(singletons)


def word_hashes(text_col: Column | str) -> Column:
    """xxhash64 of each distinct word — stage this as its own projection
    before feeding :func:`simhash_from_hashes` (see CollapseProject note
    in :func:`minhash_near_dup_pairs`)."""
    return F.transform(
        F.array_distinct(F.split(normalized_text(text_col), " ")),
        lambda w: F.xxhash64(w),
    )


def prefix_similarity_join(
    ws: DataFrame,
    id_col: str,
    words_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (AllPairs /
    PPJoin): returns (id_a, id_b, jaccard) for every pair with
    Jaccard >= threshold, WITHOUT enumerating the quadratic pair space.

    Guarantee: order tokens by ascending global frequency; a document
    with n tokens keeps a prefix of n - ceil(t*n) + 1 tokens. If two
    documents share no prefix token, their Jaccard is < t — so an
    equi-join on prefix tokens yields a candidate superset, verified
    exactly afterward. Rare-first ordering makes prefix buckets small,
    which is what bounds the join fan-out at scale.

    ``ws`` must have distinct-element arrays in ``words_col``. When
    ``block_col`` is given, pairs are additionally required to match on
    it (both the candidate join and the semantics).

    Degenerate-vocabulary fast path: when the corpus has ≤ 63 distinct
    tokens (tiny controlled vocabularies; synthetic corpora), prefix
    filtering cannot prune — every "rare" token still occurs in a large
    fraction of documents, so the candidate multiplicity explodes (we
    measured 29M candidate rows for 3.2M distinct pairs). Each word set
    is then encoded as one int64 bitmask and Jaccard becomes two
    ``bit_count`` ops on an equi-join over the block key: every pair is
    generated exactly once, nothing needs dedup, and verification is
    pure integer codegen. Identical result set, same rational
    arithmetic (int intersection / int union) as the array form.
    """
    from pyspark.sql import Window

    t = float(threshold)
    blocks = [block_col] if block_col else []
    tok = ws.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in blocks],
        F.explode(words_col).alias("_w"),
    )
    # Token document-frequencies, materialized once (vocabulary-sized)
    # — both the dispatch probe and the rank join read from this
    # checkpoint instead of re-running the corpus-wide aggregation.
    counts = (
        tok.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_df"))
        .localCheckpoint(eager=True)
    )
    vocab_size = counts.count()
    # Global total order on tokens: (frequency asc, token asc) → dense
    # integer rank. The single-partition window runs over the (small)
    # vocabulary checkpoint only; past ~1e8 distinct tokens swap
    # row_number for zipWithIndex-style ranking.
    vocab = counts.withColumn(
        "_r",
        F.row_number().over(Window.orderBy(F.col("_df"), F.col("_w"))),
    ).select("_w", "_r")
    if vocab_size <= 63:
        masks = (
            tok.join(F.broadcast(vocab), "_w")
            .groupBy("_id", *blocks)
            .agg(
                F.sum(
                    F.expr("shiftleft(CAST(1 AS BIGINT), _r - 1)")
                ).alias("_mask"),
                F.count(F.lit(1)).alias("_n"),
            )
            # both self-join sides read the doc-sized mask table: one
            # explode + mask-agg pass, not one per side
            .localCheckpoint()
        )
        a, b = masks.alias("a"), masks.alias("b")
        cond = F.col("a._id") < F.col("b._id")
        for c in blocks:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        inter = F.bit_count(
            F.col("a._mask").bitwiseAND(F.col("b._mask"))
        )
        union = F.col("a._n") + F.col("b._n") - inter
        jac = inter.cast("double") / union.cast("double")
        return (
            a.join(b, cond)
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= t)
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                "jaccard",
            )
        )
    docr = (
        tok.join(vocab, "_w")
        .groupBy("_id", *blocks)
        .agg(F.sort_array(F.collect_list("_r")).alias("_ranks"))
        .withColumn("_n", F.size("_ranks"))
        # rank-array table feeds the prefix explode AND both verify
        # rejoin sides: one rank-agg pass, not one per consumer
        .localCheckpoint()
    )
    prefix_len = (F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1).cast("int")
    pref = docr.select(
        "_id",
        *blocks,
        F.explode(F.slice("_ranks", 1, prefix_len)).alias("_pr"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cond = (F.col("a._pr") == F.col("b._pr")) & (
        F.col("a._id") < F.col("b._id")
    )
    for c in blocks:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ra = docr.select(
        F.col("_id").alias("id_a"),
        F.col("_ranks").alias("_ra"),
        F.col("_n").alias("_na"),
    )
    rb = docr.select(
        F.col("_id").alias("id_b"),
        F.col("_ranks").alias("_rb"),
        F.col("_n").alias("_nb"),
    )
    inter = F.size(F.array_intersect("_ra", "_rb"))
    j = inter.cast("double") / (F.col("_na") + F.col("_nb") - inter).cast(
        "double"
    )
    return (
        cand.join(ra, "id_a")
        .join(rb, "id_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text_col: Column | str, num_bits: int = 64) -> Column:
    """SimHash: bit b set iff more than half the word hashes have bit b
    set. One int64 per document, pure higher-order functions. Prefer
    staging :func:`word_hashes` first on hot paths."""
    return simhash_from_hashes(word_hashes(text_col), num_bits)


def simhash_from_hashes(hashes: Column, num_bits: int = 64) -> Column:
    n = F.size(hashes)

    def ones(b: int):
        # count of elements with bit b set — an integer FOLD, not
        # filter+size (filter materializes a filtered array per bit;
        # 64 bits × per-row allocation dominated the signature cost)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)),
        )

    bit = lambda b: F.when(  # noqa: E731
        ones(b) * 2 > n, F.lit(1).cast("long")
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
        F.col(id_col).alias("_id"), word_hashes(text_col).alias("_h")
    ).select("_id", simhash_from_hashes(F.col("_h")).alias("_sim"))
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
    # Both self-join sides read this frame: one eager (id, sim, band)
    # checkpoint runs the word-hash + simhash pass once, not twice.
    banded = banded.localCheckpoint(eager=True)
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


def containment_similarity_join(
    ws: DataFrame,
    id_col: str,
    words_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Exact DIRECTIONAL set-containment self-join: returns
    (id_a, id_b, containment) for every ORDERED pair a != b with
    C(a in b) = |A n B| / |A| >= threshold — the asymmetric near-dup
    metric for quote/subset detection (Broder 1997's containment, the
    companion to resemblance/Jaccard; Lee et al. 2022 use the same
    notion for train-set contamination).

    Same two-regime design as :func:`prefix_similarity_join`:

    - vocab <= 63: one int64 bitmask per document; every in-block
      ordered pair verified with two ``bit_count`` codegen ops, no
      candidate dedup needed.
    - general: prefix filtering adapted to containment. A pair needs
      |A n B| >= ceil(t*|A|), so if B shares NONE of the
      |A| - ceil(t*|A|) + 1 rarest tokens of A, the intersection fits
      inside A's (ceil(t*|A|) - 1)-token suffix and must fail — the
      A-side prefix join is a provable candidate superset. The B side
      cannot be pruned (a superset's own rare tokens say nothing), so
      candidates come from A-prefix x B-all-tokens; that asymmetric
      fan-out is the known cost of containment joins at scale and is
      bounded by blocking + the rare-first token order.
    """
    from pyspark.sql import Window

    t = float(threshold)
    blocks = [block_col] if block_col else []
    tok = ws.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in blocks],
        F.explode(words_col).alias("_w"),
    )
    counts = (
        tok.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_df"))
        .localCheckpoint(eager=True)
    )
    vocab_size = counts.count()
    vocab = counts.withColumn(
        "_r",
        F.row_number().over(Window.orderBy(F.col("_df"), F.col("_w"))),
    ).select("_w", "_r")
    if vocab_size <= 63:
        masks = (
            tok.join(F.broadcast(vocab), "_w")
            .groupBy("_id", *blocks)
            .agg(
                F.sum(
                    F.expr("shiftleft(CAST(1 AS BIGINT), _r - 1)")
                ).alias("_mask"),
                F.count(F.lit(1)).alias("_n"),
            )
            # both self-join sides read the doc-sized mask table: one
            # explode + mask-agg pass, not one per side
            .localCheckpoint()
        )
        a, b = masks.alias("a"), masks.alias("b")
        cond = F.col("a._id") != F.col("b._id")
        for c in blocks:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        inter = F.bit_count(F.col("a._mask").bitwiseAND(F.col("b._mask")))
        cont = inter.cast("double") / F.col("a._n").cast("double")
        return (
            a.join(b, cond)
            .withColumn("containment", cont)
            .filter(F.col("containment") >= t)
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                "containment",
            )
        )
    docr = (
        tok.join(vocab, "_w")
        .groupBy("_id", *blocks)
        .agg(F.sort_array(F.collect_list("_r")).alias("_ranks"))
        .withColumn("_n", F.size("_ranks"))
        # rank-array table feeds the prefix explode AND both verify
        # rejoin sides: one rank-agg pass, not one per consumer
        .localCheckpoint()
    )
    prefix_len = (F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1).cast("int")
    pref = docr.select(
        "_id",
        *blocks,
        F.explode(F.slice("_ranks", 1, prefix_len)).alias("_pr"),
    )
    full = docr.select(
        "_id", *blocks, F.explode("_ranks").alias("_pr")
    )
    a, b = pref.alias("a"), full.alias("b")
    cond = (F.col("a._pr") == F.col("b._pr")) & (
        F.col("a._id") != F.col("b._id")
    )
    for c in blocks:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        a.join(b, cond)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ra = docr.select(
        F.col("_id").alias("id_a"),
        F.col("_ranks").alias("_ra"),
        F.col("_n").alias("_na"),
    )
    rb = docr.select(F.col("_id").alias("id_b"), F.col("_ranks").alias("_rb"))
    inter = F.size(F.array_intersect("_ra", "_rb"))
    return (
        cand.join(ra, "id_a")
        .join(rb, "id_b")
        .withColumn(
            "containment", inter.cast("double") / F.col("_na").cast("double")
        )
        .filter(F.col("containment") >= t)
        .select("id_a", "id_b", "containment")
    )
