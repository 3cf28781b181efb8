"""Graph analytics over the star schema (engine extension — SURVEY
§3.8 territory: the connected-components primitive in operators/dedup
already does min-label propagation; this module adds the other classic
iterative-graph shape, PageRank, in an oracle-exact form).

Exactness trick: textbook PageRank iterates on doubles, and float sums
over differently-ordered edge streams cannot hash-match across
engines. Here ranks are INTEGER-SCALED (1e6 = rank 1.0) and the update
uses integer division only::

    rank'(v) = TELEPORT + (85 * Σ_{u→v} rank(u) div deg(u)) div 100

Both Spark's ``div`` and DuckDB's ``//`` are floor division on
BIGINT, every intermediate is exact, so a fixed iteration count gives
bit-identical ranks — a DuckDB oracle can replay it as chained CTEs.

Scale shape (what survives 100 TB): the edge list is the big side and
is touched once per iteration by ONE shuffle join on src plus one
hash agg on dst (partial combine); the rank/degree tables are
node-sized. Degrees are joined into the edge list ONCE before the
loop and the result persisted, so iterations reuse the same shuffled
layout. Driver holds nothing (no collect in the loop)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.registry import register

_SCALE = 1_000_000
_TELEPORT = 150_000  # 0.15 * scale
_ITERS = 3


def _pagerank_oracle() -> str:
    it = """
    r{n} AS (
        SELECT e.dst AS node,
               CAST({tp} + (85 * sum(r.rank // e.deg)) // 100 AS BIGINT)
                 AS rank
        FROM edges e JOIN r{p} r ON e.src = r.node
        GROUP BY e.dst
    )"""
    chain = ",".join(
        it.format(n=i + 1, p=i, tp=_TELEPORT) for i in range(_ITERS)
    )
    return f"""
    WITH half AS (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), sym AS (
        SELECT src, dst FROM half
        UNION ALL
        SELECT dst AS src, src AS dst FROM half
    ), deg AS (
        SELECT src AS node, count(*) AS deg FROM sym GROUP BY src
    ), edges AS (
        SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d ON d.node = s.src
    ), r0 AS (
        SELECT node, CAST({_SCALE} AS BIGINT) AS rank FROM deg
    ), {chain}
    SELECT node AS node_id,
           CAST(node % 2 AS INT) AS is_supplier,
           rank AS rank_e6
    FROM r{_ITERS}
    """


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier bipartite trade graph
    (distinct pairs from orders⋈lineitem, symmetrized), 3 iterations,
    damping 0.85, integer-scaled so the result is oracle-EXACT (see
    module docstring). Every node has degree ≥ 1 by construction, so
    there is no dangling-mass term.

    The whole build runs inside a shuffle-partition scope sized to the
    ~1M-edge layout (a vanilla 200-partition session would spin 200
    tasks for each of the ~8 node-sized stages in the loop; at real
    scale the edge volume, not a session default, should set this)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        return _pagerank_build(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _pagerank_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")

    half = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one edge-layout: degrees ride along so the loop re-joins only the
    # node-sized rank table each iteration
    edges = sym.join(deg, "src").persist()

    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(_ITERS):
        ranks = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(_TELEPORT) + F.expr(f"(85 * s) div 100"))
                .cast("bigint")
                .alias("rank"),
            )
        )
    # Materialize the final node-sized ranks across executors (eager
    # localCheckpoint = the standard lineage cut for iterative algos),
    # then release the edge-layout cache — a shared session running
    # many queries must not accumulate edge-sized cache entries.
    ranks = ranks.localCheckpoint()
    edges.unpersist()
    out = ranks.select(
        F.col("node").alias("node_id"),
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.col("rank").alias("rank_e6"),
    )
    return out


@register(
    "graph_triangles",
    oracle="""
    WITH trade AS (
        SELECT DISTINCT
               least(c.c_nationkey, s.s_nationkey) AS u,
               greatest(c.c_nationkey, s.s_nationkey) AS v
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ), tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM trade e1
        JOIN trade e2 ON e2.u = e1.v
        JOIN trade e3 ON e3.u = e1.u AND e3.v = e2.v
    ), member AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT n_name AS node, count(*) AS n_triangles
    FROM member JOIN nation ON node = n_nationkey
    GROUP BY n_name
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the international-trade graph (nations are
    nodes; an undirected edge exists where any order ships between the
    two nations). The standard distributed formulation: canonicalize
    edges u<v (each triangle appears exactly once as a<b<c), then two
    self-equi-joins — e1(a,b)⋈e2(b,c)⋈e3(a,c) — and a membership
    explode for per-node counts. Edge derivation is the fact-side join
    (dims broadcast); the triangle joins run on the DEDUPLICATED edge
    list, which is |V|²-bounded — at 100 TB the heavy lifting stays in
    the distinct, and the triangle enumeration is proportional to the
    graph, not the data."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    trade = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .distinct()
        # |V|^2-bounded result read by SIX consumers (3 triangle-join
        # legs x 3 membership branches): one eager checkpoint runs the
        # fact-side derivation once — without it the plan re-embeds the
        # lineitem⋈orders join per leg (observed: 37 scans).
        .localCheckpoint()
    )
    e1 = trade.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = trade.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = trade.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    member = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return (
        member.join(
            F.broadcast(nation), F.col("node") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("node_name"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .select(F.col("node_name").alias("node"), "n_triangles")
    )


@register(
    "graph_khop_reach",
    oracle="""
    WITH half AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), hop1 AS (
        SELECT supp, count(DISTINCT cust) AS n_hop1
        FROM half GROUP BY supp
    ), hop2 AS (
        SELECT a.supp, count(DISTINCT b.supp) AS n_hop2
        FROM half a JOIN half b ON a.cust = b.cust
        WHERE b.supp <> a.supp
        GROUP BY a.supp
    )
    SELECT h1.supp AS supplier_id,
           h1.n_hop1 AS n_customers,
           COALESCE(h2.n_hop2, 0) AS n_peer_suppliers
    FROM hop1 h1 LEFT JOIN hop2 h2 ON h1.supp = h2.supp
    """,
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop neighborhood size on the bipartite trade graph: per
    supplier, the 1-hop reach (distinct customers) and 2-hop reach
    (distinct OTHER suppliers sharing a customer) — the neighborhood-
    expansion primitive under collaborative filtering and fraud-ring
    detection. The 2-hop set is a self-join of the deduped edge list
    on the customer side followed by a distinct count: edges are
    touched once per hop, counts stay aggregated — no per-node
    adjacency lists materialize on any single machine. AQE's
    skew-join splitting handles a hot customer in the JOIN itself,
    but the pair stream is still Σ deg(cust)² — on power-law graphs
    pass ``hub_cap`` to :func:`_khop_exact` (drop hub customers from
    hop 2, bounding pairs at cap·|edges|) or use the sketch form
    (`graph_khop_reach_approx`), whose shuffle is linear in edges."""
    return _khop_exact(_khop_half(spark, sf_dir))


def _khop_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped bipartite (cust, supp) edge list shared by every k-hop
    flavor."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .distinct()
    )


def _khop_exact(half: DataFrame, hub_cap: int | None = None) -> DataFrame:
    """Exact 1-hop/2-hop reach. ``hub_cap``: customers with more than
    this many suppliers are excluded from the hop-2 expansion (their
    near-clique contribution dominates Σ deg² on power-law graphs);
    hop-1 counts stay exact. With cap c the pair stream is ≤ c·|edges|
    — the standard bounded-exact compromise; the HLL form keeps hubs
    AND linear shuffle at the price of ~1.6% estimate error."""
    hop2_src = half
    if hub_cap is not None:
        deg = half.groupBy("cust").agg(F.count(F.lit(1)).alias("_deg"))
        hop2_src = (
            half.join(deg.where(F.col("_deg") <= hub_cap), "cust")
            .select("cust", "supp")
        )
    hop1 = half.groupBy("supp").agg(
        F.count_distinct("cust").alias("n_customers")
    )
    b = hop2_src.select(
        F.col("cust").alias("cust2"), F.col("supp").alias("peer")
    )
    hop2 = (
        hop2_src.join(b, hop2_src.cust == b.cust2)
        .where(F.col("peer") != F.col("supp"))
        .groupBy("supp")
        .agg(F.count_distinct("peer").alias("n_peer_suppliers"))
    )
    return (
        hop1.join(hop2, "supp", "left")
        .select(
            F.col("supp").alias("supplier_id"),
            "n_customers",
            F.coalesce("n_peer_suppliers", F.lit(0)).alias(
                "n_peer_suppliers"
            ),
        )
    )


@register("graph_khop_reach_approx")
def graph_khop_reach_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-scale k-hop: the HLL-sketch variant of `graph_khop_reach`
    (VERDICT r5 "What's missing" #5). Instead of materializing the
    Σ deg(cust)² hop-2 pair stream and exploding count_distinct keys,
    each customer aggregates ONE DataSketches HLL of its supplier set
    (`hll_sketch_agg`, lgConfigK=12, ~4 KB worst case, far smaller in
    sparse mode); the edge list joins those per-customer sketches on
    the customer key and `hll_union_agg` merges them per supplier —
    mergeable partial state, so the shuffle is map-side combined and
    LINEAR in |edges| regardless of hub degree. The union necessarily
    contains the supplier itself (it is one of its customers'
    suppliers), so the peer estimate reports round(est) - 1, floored
    at 0.

    Rows-only by contract (sketch family has no DuckDB twin);
    tests/test_round6_ops.py bounds it against the exact form
    (≤ 5% rel error at lgK=12) and pins the hub-cap contract."""
    half = _khop_half(spark, sf_dir)
    per_cust = half.groupBy("cust").agg(
        F.hll_sketch_agg("supp", 12).alias("supp_sk")
    )
    hop1 = half.groupBy("supp").agg(
        F.count_distinct("cust").alias("n_customers")
    )
    hop2 = (
        half.join(per_cust, "cust")
        .groupBy("supp")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("supp_sk")).alias("_est")
        )
        .select(
            "supp",
            F.greatest(
                F.round(F.col("_est")).cast("bigint") - 1, F.lit(0)
            ).alias("est_peer_suppliers"),
        )
    )
    return hop1.join(hop2, "supp", "left").select(
        F.col("supp").alias("supplier_id"),
        "n_customers",
        F.coalesce("est_peer_suppliers", F.lit(0)).alias(
            "est_peer_suppliers"
        ),
    )


_SSSP_HOPS = 3


def _sssp_oracle() -> str:
    hop = """
    d{n} AS (
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
            SELECT node, dist FROM d{p}
            UNION ALL
            SELECT e.dst AS node, d.dist + 1 AS dist
            FROM edges e JOIN d{p} d ON e.src = d.node
        ) GROUP BY node
    )"""
    chain = ",".join(hop.format(n=i + 1, p=i) for i in range(_SSSP_HOPS))
    return f"""
    WITH half AS (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
        SELECT src, dst FROM half
        UNION ALL
        SELECT dst AS src, src AS dst FROM half
    ), d0 AS (
        SELECT DISTINCT dst AS node, CAST(0 AS BIGINT) AS dist
        FROM half WHERE (dst - 1) // 2 % 10 = 1
    ), {chain}
    SELECT node AS node_id,
           CAST(node % 2 AS INT) AS is_supplier,
           CAST(dist AS INT) AS hops
    FROM d{_SSSP_HOPS}
    """


@register("graph_sssp_hops", oracle=_sssp_oracle())
def graph_sssp_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (unweighted SSSP) on the
    customer<->supplier trade graph — the frontier-expansion primitive
    under reachability audits and blast-radius queries. Seeds are the
    suppliers with suppkey % 10 == 1; each of the 3 bounded rounds
    relaxes dist(v) = min(dist(v), min over in-edges of dist(u)+1) as
    one edge⋈dist join plus one MIN agg — the Pregel iteration shape
    expressed as vanilla DataFrame ops. Distances are small integers,
    so the per-node result is oracle-EXACT (chained CTEs replay the
    same rounds in DuckDB).

    Scale shape: the edge list is shuffled ONCE into its join layout
    and persisted; every round touches it with a single hash join
    against the node-sized dist table and a map-side-combinable MIN —
    no collect, no per-node adjacency lists, frontier never leaves the
    cluster. Shuffle-partition scope pinned for the ~node-sized loop
    stages (same rationale as `graph_pagerank`)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        half = _khop_half(spark, sf_dir).select(
            (F.col("cust") * 2).alias("src"),
            (F.col("supp") * 2 + 1).alias("dst"),
        )
        sym = half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        edges = sym.persist()
        dist = (
            half.where(F.expr("((dst - 1) div 2) % 10 = 1"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .select("node", F.lit(0).cast("bigint").alias("dist"))
        )
        for _ in range(_SSSP_HOPS):
            relaxed = edges.join(dist, edges.src == dist.node).select(
                F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                # dist appears TWICE per round (union branch + join
                # probe): without a per-round lineage cut the subtree
                # DOUBLES each iteration — 2^rounds copies of the seed
                # scan in the final plan (observed: 20 scans for 3
                # rounds) and the seed re-executes per copy. Eager
                # node-sized checkpoint per round = the k-core pattern.
                .localCheckpoint()
            )
        out = dist.select(
            F.col("node").alias("node_id"),
            (F.col("node") % 2).cast("int").alias("is_supplier"),
            F.col("dist").cast("int").alias("hops"),
        )
        edges.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_LPA_ROUNDS = 2


def _lpa_oracle() -> str:
    rnd = """
    r{n} AS (
        SELECT e.dst AS node, l.label, count(*) AS n
        FROM edges e JOIN l{p} l ON e.src = l.node GROUP BY 1, 2
    ), l{n} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY n DESC, label) AS rk
            FROM r{n}) WHERE rk = 1
    )"""
    chain = ",".join(rnd.format(n=i + 1, p=i) for i in range(_LPA_ROUNDS))
    return f"""
    WITH half AS (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
        SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half
    ), l0 AS (
        SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS label FROM edges
    ), {chain}
    SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_checksum
    FROM l{_LPA_ROUNDS} GROUP BY label
    """


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label propagation community detection (synchronous LPA) on the
    trade graph: every node starts as its own label; each round it
    adopts the MODE of its neighbors' labels (ties -> smallest label,
    making the rounds fully deterministic and oracle-EXACT — textbook
    async LPA is order-dependent; the synchronous+tie-broken variant
    is the one a distributed engine can honestly offer). Two rounds;
    complements `dedup_components` (min-label = connectivity) by
    propagating the MAJORITY signal instead. Per round: one edge⋈label
    hash join, one (node,label) count agg, one per-node argmax — the
    argmax is a `min_by` hash aggregate over the ordering struct
    (-n, label), not a window: (node, label) rows are unique upstream
    so min_by is deterministic and reproduces the row_number tiebreak
    (n desc, label asc) exactly, while partially combining map-side
    instead of sorting every partition. Edges persisted once, no
    collect."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        half = _khop_half(spark, sf_dir).select(
            (F.col("cust") * 2).alias("src"),
            (F.col("supp") * 2 + 1).alias("dst"),
        )
        edges = half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).persist()
        labels = edges.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").cast("bigint").alias("label")
        )
        for _ in range(_LPA_ROUNDS):
            counted = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("node2"), "label")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("node2").alias("node"), "label", "n")
            )
            labels = counted.groupBy("node").agg(
                F.min_by(
                    "label",
                    F.struct((-F.col("n")).alias("_o"), F.col("label").alias("_l")),
                ).alias("label")
            )
        return labels.groupBy("label").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("node_checksum"),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Chained-CTE oracle replaying the SAME bounded peel rounds (the
    `graph_sssp_hops` proof shape: both engines run identical rounds,
    so the per-node result is exact whether or not the peel has
    converged)."""
    step = """
    a{n} AS (
        SELECT src FROM e{p} GROUP BY src HAVING COUNT(*) >= {k}
    ), e{n} AS (
        SELECT e.src, e.dst FROM e{p} e
        JOIN a{n} s ON e.src = s.src
        JOIN a{n} d ON e.dst = d.src
    )"""
    chain = ",".join(
        step.format(n=i + 1, p=i, k=k) for i in range(rounds)
    )
    return f"""
    WITH nodes AS (
        SELECT c_custkey AS u,
               (SELECT MAX(c_custkey) + 1 FROM customer) AS m
        FROM customer
    ), half AS (
        SELECT u AS src, (2 * u + 7) % m AS dst FROM nodes
        UNION ALL
        SELECT u AS src, (3 * u + 11) % m AS dst FROM nodes
    ), valid AS (
        SELECT DISTINCT h.src, h.dst FROM half h
        JOIN customer c ON c.c_custkey = h.dst
        WHERE h.src <> h.dst
    ), e0 AS (
        SELECT src, dst FROM valid
        UNION
        SELECT dst AS src, src AS dst FROM valid
    ), {chain}
    SELECT src AS node_id,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{rounds} GROUP BY src
    """


_KCORE_K = 3
_KCORE_ROUNDS = 4


@register("graph_kcore", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative PEELING — repeatedly delete
    nodes of degree < k until the maximal subgraph with all degrees
    >= k remains (the community-density / graph-sparsification
    primitive; Matula-Beck 1983 peeling expressed as bounded Pregel
    rounds). Graph: a deterministic chord graph over customer keys
    (u -> (2u+7) mod M and u -> (3u+11) mod M, symmetrized, self-loops
    dropped, endpoints both present) — average degree ~4, so peeling
    at k = 3 CASCADES across rounds rather than converging trivially.
    Each round is one degree agg (HAVING >= k) plus two semi-join
    filters of the edge list against the survivor set; 4 bounded
    rounds replayed identically by the chained-CTE oracle, so every
    (node, degree) row is hash-exact regardless of convergence. Scale:
    the SYMMETRIZED edge list persists ONCE as the static layout (the
    `graph_pagerank` discipline), hash-clustered by src at build time
    so every per-round degree agg reuses the cached partitioning (no
    exchange); the loop state is the NODE-sized survivor set, eagerly
    localCheckpointed per round to cut lineage — never a re-derived
    edge list, whose per-round recompute made the first cut of this
    query 20x slower. While the survivor set fits the broadcast
    budget it is broadcast into both semi-join legs (the
    `connected_components` gate), so a peeling round shuffles NOTHING
    — past the budget the same joins fall back to the shuffle path,
    the scalable default. No collect, no per-node adjacency state,
    rounds are data-parallel joins all the way down (shuffle
    partitions scoped like the other iterative graph queries)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("u")
        )
        # Node-count gate for broadcasting the survivor set: survivors
        # only shrink, so one bound check covers every round. 2M ids
        # ≈ 16 MB broadcast — the connected_components budget.
        bcast = cust.count() <= 2_000_000
        gate = F.broadcast if bcast else (lambda df: df)
        m = cust.agg((F.max("u") + 1).alias("m"))
        nodes = cust.crossJoin(F.broadcast(m))
        half = nodes.select(
            F.col("u").alias("src"),
            ((2 * F.col("u") + 7) % F.col("m")).alias("dst"),
        ).unionByName(
            nodes.select(
                F.col("u").alias("src"),
                ((3 * F.col("u") + 11) % F.col("m")).alias("dst"),
            )
        )
        valid = (
            half.join(
                cust.select(F.col("u").alias("dst")), "dst"
            )
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst")
        )
        # One shuffle builds the whole static layout: cluster by src,
        # THEN dedup — hash(src) co-locates equal (src, dst) pairs, so
        # the distinct agg runs on the src partitioning without its
        # own exchange (this also subsumes the old pre-symmetrize
        # distinct), and the persisted table keeps hash(src) so each
        # round's groupBy(src) is exchange-free.
        edges = (
            valid.unionByName(
                valid.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .repartition("src")
            .distinct()
            .persist()
        )
        alive = None  # None = all nodes alive (round 0 skips the filter)
        for _ in range(_KCORE_ROUNDS):
            cur = edges
            if alive is not None:
                cur = cur.join(gate(alive), "src").join(
                    gate(alive.select(F.col("src").alias("dst"))), "dst"
                )
            alive = (
                cur.groupBy("src")
                .agg(F.count(F.lit(1)).alias("deg"))
                .where(F.col("deg") >= _KCORE_K)
                .select("src")
                .localCheckpoint()  # eager node-sized lineage cut
            )
        core = edges.join(gate(alive), "src").join(
            gate(alive.select(F.col("src").alias("dst"))), "dst"
        )
        out = core.groupBy(F.col("src").alias("node_id")).agg(
            F.count(F.lit(1)).cast("bigint").alias("core_degree")
        )
        out = out.localCheckpoint()
        edges.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
