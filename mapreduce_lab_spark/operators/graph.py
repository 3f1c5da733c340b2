"""Graph-shaped analytics over relational data: co-occurrence degree.

Superset surface (the reference's closest analog is the inverted
index, ``plugin/indexer/indexer.go:14-33`` — a bipartite term→doc
edge list; this module materializes the one-mode projection of such
a bipartite graph and its degree distribution, the first diagnostics
pass of any large-graph pipeline).

``copurchase_degree_hist``: parts are nodes; an edge connects two
parts that appear in the same order. Output is the degree histogram
(how many parts have degree d).

Scale shape: pair generation collects each order's distinct items
into a basket array (one groupBy shuffle) and expands (p1 < p2)
pairs in-task — output is sum over orders of k·(k−1)/2 where k is
lines-per-order, and k is BOUNDED (≤7 in TPC-H-shaped data; bounded
basket size generally). For unbounded baskets the guard is a
per-order line cap (filter before the expansion), the same
discipline as the shingle prefix filter in ``dedup.py``. The
projection dedups (part-pair) with a map-side-combinable distinct,
then degree and histogram are two more integer aggregations — every
shuffle carries keys+counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def _order_baskets(lineitem: DataFrame) -> DataFrame:
    """Per-order sorted distinct item arrays: ONE groupBy(orderkey)
    shuffle, with collect_set doing the per-order distinct inside the
    same exchange (replaces the round-4 distinct() + self-join, which
    shuffled twice)."""
    return lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )


def _basket_pair_rows(baskets: DataFrame) -> DataFrame:
    """(p1 < p2) co-occurrence rows, one per (order, pair), expanded
    in-task from the basket array — quadratic only in the basket size,
    which is bounded by construction in a basket graph (TPC-H <= 7,
    retail ~100s): the same bounded-fanout assumption the former
    self-join relied on for its join output size."""
    pair_expr = F.expr(
        """
        flatten(transform(ps, (x, i) ->
          transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))
        """
    )
    return baskets.select(F.explode(pair_expr).alias("pr")).select(
        F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2")
    )


def copurchase_degree_hist(lineitem: DataFrame) -> DataFrame:
    pairs = _basket_pair_rows(_order_baskets(lineitem)).distinct()
    # Each undirected edge contributes degree to both endpoints.
    degrees = (
        pairs.select(F.col("p1").alias("part"))
        .unionAll(pairs.select(F.col("p2").alias("part")))
        .groupBy("part")
        .agg(F.count("*").alias("degree"))
    )
    return (
        degrees.groupBy("degree")
        .agg(F.count("*").alias("n_parts"))
    )


# --- PageRank -------------------------------------------------------------

PAGERANK_ITERS = 3
PAGERANK_UNITS = 10**12  # total rank mass, in integer units
# damping d = 0.85 as the integer pair (85, 100): all rank arithmetic
# is BIGINT multiply + floor-div, so Spark and the oracle agree bit-
# for-bit (double summation would be order-dependent across engines).
_D_NUM, _D_COMP = 85, 15


def pagerank_copurchase(lineitem: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Fixed-iteration PageRank over the undirected copurchase graph.

    Rank mass is carried as exact integer units (PAGERANK_UNITS total):
    each step is ``rank div deg`` per edge, an integer sum per node,
    then ``(15 * (U div N)) div 100 + (85 * sum) div 100`` — floor
    divisions of positive BIGINTs, identical in Spark and DuckDB, so
    the iterative result is exactly reproducible cross-engine (the
    oracle unrolls the same three steps as chained CTEs).

    Scale shape: the classic distributed PageRank loop — per
    iteration, one join of the edge list with the current rank vector
    on ``src`` and one groupBy(``dst``); the shuffle carries (key,
    BIGINT) pairs only. The degree column rides along with the edge
    list (joined once, cached) so each iteration is exactly one join +
    one aggregation. On a real cluster the edge list would be
    bucketed by ``src`` so the per-iteration join is shuffle-free on
    the edge side; every node has deg >= 1 by construction (nodes are
    edge endpoints) so there is no dangling-mass term.
    """
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = edges.join(deg, "src").cache()
    nodes = edges_deg.select(F.col("src").alias("part")).distinct()
    # One deliberate scalar materialization: N is needed as an exact
    # integer inside every iteration's rank formula, and folding it in
    # as a literal keeps each iteration to exactly one join + one agg
    # (a broadcast-joined scalar would re-derive the whole graph-
    # construction subtree per iteration). This count also materializes
    # the edge-list cache every later step reads.
    n_nodes = nodes.count()
    if n_nodes == 0:  # empty graph: no nodes, no ranks — not a crash
        return nodes.select("part", F.lit(0).cast("long").alias("rank_units"))
    base_units = PAGERANK_UNITS // n_nodes
    teleport_units = (_D_COMP * base_units) // 100
    ranks = nodes.select("part", F.lit(base_units).alias("rank_units"))
    for _ in range(iters):
        contrib = edges_deg.join(
            ranks.select(F.col("part").alias("src"), "rank_units"), "src"
        ).select(
            F.col("dst").alias("part"),
            F.expr("rank_units div deg").alias("c"),
        )
        ranks = (
            contrib.groupBy("part")
            .agg(F.sum("c").alias("s"))
            .select(
                "part",
                (F.lit(teleport_units) + F.expr(f"({_D_NUM} * s) div 100")).alias(
                    "rank_units"
                ),
            )
        )
    return ranks.select("part", "rank_units")


def _oracle_pagerank(iters: int = PAGERANK_ITERS) -> str:
    u = PAGERANK_UNITS
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
        SELECT e.dst AS part,
               CAST(({_D_COMP} * ({u} // n.n_nodes)) // 100
                    + ({_D_NUM} * sum(r.rank_units // e.deg)) // 100 AS BIGINT)
                   AS rank_units
        FROM edges_deg e JOIN {prev} r ON e.src = r.part, n
        GROUP BY e.dst, n.n_nodes
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
    ),
    edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    edges_deg AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    r0 AS (SELECT src AS part, ({u} // n_nodes) AS rank_units FROM deg, n),
    {chain}
    SELECT part, rank_units FROM {prev}
    """


@query("pagerank_copurchase", oracle=_oracle_pagerank())
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_copurchase(load_table(spark, sf_dir, "lineitem"))


# --- bounded-hop reachability via WITH RECURSIVE --------------------------

# One SQL text, two engines: Spark 4 executes recursive CTEs natively
# (iterative union-loop under the hood, the same join-per-round shape
# as the hand-rolled PageRank loop above), and DuckDB runs the
# identical ANSI string as the oracle — the strongest parity check
# available for the recursive surface.
MIN_COPURCHASES = 2  # edge significance threshold (and densification guard)

_REACH_SQL = f"""
WITH RECURSIVE
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    -- REPEAT-copurchase edges only (same significance gate as the
    -- triangle census): the raw pair graph densifies with scale, and
    -- path-multiset recursion over it exceeds any row budget (hit
    -- Spark's RECURSION_ROW_LIMIT at sf0.1); the repeat graph keeps
    -- per-node degree bounded, so the 2-hop path count stays small.
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_COPURCHASES}
),
edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
reach(part_id, hop) AS (
    SELECT p_partkey, 0 FROM part WHERE p_partkey % 97 = 0
    UNION ALL
    SELECT e.dst, r.hop + 1
    FROM reach r JOIN edges e ON e.src = r.part_id
    WHERE r.hop < 2
)
SELECT part_id, min(hop) AS hops, count(*) AS n_paths
FROM reach GROUP BY part_id
"""


@query("recursive_reachable_parts", oracle=_REACH_SQL)
def q_recursive_reachable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts reachable within 2 hops of a deterministic seed set in the
    copurchase graph, with shortest hop and path count, via a recursive
    CTE (new SQL surface in Spark 4.x).

    Scale shape: each recursion level is one shuffle join of the
    frontier with the edge list plus a union — identical physical
    shape to the PageRank loop, but planned by the engine. The
    recursion is HOP-BOUNDED (hop < 2 → 3 levels), which is the only
    honest way to run transitive closure at 100 TB: an unbounded
    closure on a dense co-occurrence graph is quadratic in reach. The
    final GROUP BY collapses the path multiset into per-node
    aggregates, so only the bounded frontier ever materializes.
    Reference analog: none (no joins in the reference at all,
    core/worker.go); pure superset surface.
    """
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_REACH_SQL)


@query(
    "copurchase_degree_hist",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
        FROM li a JOIN li b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
    ),
    degrees AS (
        SELECT part, count(*) AS degree
        FROM (SELECT p1 AS part FROM pairs
              UNION ALL SELECT p2 AS part FROM pairs)
        GROUP BY part
    )
    SELECT degree, count(*) AS n_parts FROM degrees GROUP BY degree
    """,
)
def q_copurchase_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copurchase_degree_hist(load_table(spark, sf_dir, "lineitem"))


# --- triangle counting ----------------------------------------------------



def triangle_stats(lineitem: DataFrame) -> DataFrame:
    """Exact triangle count + wedge count + global clustering, via the
    degree-ordered orientation (the MapReduce-classic NodeIterator++ /
    Cohen construction).

    Naive triangle enumeration joins the edge list to itself on a
    shared endpoint — at a hot node of degree d that wedge stage emits
    d(d-1)/2 rows (quadratic in the skew, the graph analog of the hot
    shingle). Orienting every edge from its (degree, id)-smaller
    endpoint to its larger one makes each node's OUT-degree O(sqrt(m))
    regardless of its true degree, so wedge generation is bounded by
    sum(outdeg^2) = O(m^1.5) total and no single node can blow up a
    task. Each triangle then appears as EXACTLY one wedge at its
    order-minimal vertex plus one closing oriented edge — the final
    equi-join, not a theta join.

    The oracle counts the same triangles with the id-ordered naive
    triple join — independent construction, same number.

    The graph is the REPEAT-copurchase graph: an edge requires the
    pair to co-occur in >= MIN_COPURCHASES distinct orders. That is
    the statistical-significance filter any real co-occurrence
    analysis applies (a single shared basket is noise), and it is
    simultaneously the scale guard: the unfiltered pair graph
    densifies toward n²/2 edges as the catalog outgrows basket sizes,
    while repeat pairs stay sparse — measured here, 1.2M raw pairs vs
    3.6k repeat edges at sf0.1.

    All shuffles carry integer pairs; degrees ride a broadcast join
    onto the edge list (the degree frame is one row per node with an
    edge — bounded by m).
    """
    # Basket-array pair generation (_order_baskets/_basket_pair_rows):
    # measured at sf0.1, warm 1.34 -> 1.21 s and cold 5.1 -> 2.4 s for
    # the pair subtree vs the round-4 distinct() + self-join.
    pairs = (
        _basket_pair_rows(_order_baskets(lineitem))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= F.lit(MIN_COPURCHASES))
        .select("p1", "p2")
        # The basket pair expansion + pair count is the expensive
        # subtree and feeds degrees, orientation, and the closing-edge
        # side.
        # EAGER localCheckpoint (not cache): concurrent stages of the
        # single downstream action would each race to compute an
        # unmaterialized cache; checkpointing the FILTERED edge table
        # (3.6k rows at sf0.1) runs the 1.2M-pair aggregation exactly
        # once and truncates the lineage every consumer replays.
        .localCheckpoint()
    )
    degrees = (
        pairs.select(F.col("p1").alias("node"))
        .unionAll(pairs.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    with_degs = (
        pairs.join(degrees.withColumnRenamed("node", "p1")
                   .withColumnRenamed("deg", "d1"), "p1")
        .join(degrees.withColumnRenamed("node", "p2")
              .withColumnRenamed("deg", "d2"), "p2")
    )
    # Orient from the (deg, id)-smaller endpoint to the larger.
    p1_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    oriented = with_degs.select(
        F.when(p1_first, F.col("p1")).otherwise(F.col("p2")).alias("src"),
        F.when(p1_first, F.struct("d2", "p2")).otherwise(F.struct(
            F.col("d1").alias("d2"), F.col("p1").alias("p2"))).alias("dst_s"),
    ).select(
        "src", F.col("dst_s.p2").alias("dst"), F.col("dst_s.d2").alias("ddst")
    )
    # oriented is NOT checkpointed: its three consumers replay only the
    # cheap orientation select over the already-checkpointed pairs
    # (measured at sf0.1: checkpointing it costs an extra job and runs
    # ~1.3x slower; dropping the PAIRS checkpoint instead recomputes
    # the 1.2M-pair aggregation three times and is slower still).

    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # Wedge at the order-minimal vertex; canonicalize the open pair by
    # the SAME (deg, id) order used for orientation so the closing
    # edge is findable by equi-join.
    wedges = (
        e1.join(e2, "src")
        .where(
            (F.col("e1.ddst") < F.col("e2.ddst"))
            | ((F.col("e1.ddst") == F.col("e2.ddst"))
               & (F.col("e1.dst") < F.col("e2.dst")))
        )
        .select(F.col("e1.dst").alias("x"), F.col("e2.dst").alias("y"))
    )
    closing = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    n_tri = wedges.join(closing, ["x", "y"], "inner").agg(
        F.count("*").alias("n_triangles")
    )
    n_wedge = degrees.agg(
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("long")).alias("n_wedges")
    )
    return (
        n_tri.join(F.broadcast(n_wedge))
        .select(
            "n_triangles",
            "n_wedges",
            exact_ratio(
                F.col("n_triangles") * 3, F.col("n_wedges"), out_scale=1000
            ).alias("closure_permille"),
        )
    )


_TRIANGLE_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_COPURCHASES}
),
tri AS (
    SELECT count(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
    JOIN edges e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
),
deg AS (
    SELECT node, count(*) AS d FROM (
        SELECT p1 AS node FROM edges UNION ALL SELECT p2 FROM edges
    ) GROUP BY node
),
wdg AS (SELECT CAST(sum(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT) AS n_wedges
        FROM deg)
SELECT n_triangles, n_wedges,
       {oracle_exact_ratio("n_triangles * 3", "n_wedges", out_scale=1000)}
           AS closure_permille
FROM tri, wdg
"""


@query("triangle_count_copurchase", oracle=_TRIANGLE_SQL)
def q_triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the copurchase graph (one-row result:
    triangles, wedges, global clustering coefficient in permille)."""
    return triangle_stats(load_table(spark, sf_dir, "lineitem"))


# --- item-item cosine similarity ------------------------------------------

SIM_TOPK = 30

# Per-item-totals broadcast bound: ~2M (key, count) rows is ~50 MB
# hashed on the driver — comfortably inside a default 1-4 GB driver.
# A real catalog (billions of items) blows far past this and must
# shuffle-join instead; the gate decides per run.
SIM_BROADCAST_MAX_ITEMS = 2_000_000


def _item_totals_fit_broadcast(
    raw: DataFrame, item_n: DataFrame, max_items: int | None
) -> bool:
    """Whether the per-item totals dimension is small enough to
    broadcast. Two tiers, cheapest first: the RAW input row count
    upper-bounds the item count, and counting it is an empty-
    projection scan — Spark still schedules a job over the files, but
    no column data is decoded, so it costs file-listing + footer
    metadata, not a table read (true footer-only counts need the v2
    ``spark.sql.parquet.aggregatePushdown`` path, which the v1
    ``spark.read.parquet`` scan here doesn't use — ADVICE r4); only
    when that bound is blown does the exact item count (one aggregate
    job, amortized against the giant pair join it steers) decide.
    ``None`` disables broadcasting outright (always shuffle)."""
    if max_items is None:
        return False
    if raw.count() <= max_items:
        return True
    return item_n.count() <= max_items


def item_similarity_cosine(
    lineitem: DataFrame,
    k: int = SIM_TOPK,
    broadcast_max_items: int | None = SIM_BROADCAST_MAX_ITEMS,
) -> DataFrame:
    """Top-k most-similar part pairs by co-occurrence cosine —
    item-item collaborative filtering's candidate stage.

    cosine(a,b) = n_ab / sqrt(n_a * n_b) over distinct-order
    occurrence sets. The ranking is computed WITHOUT any sqrt or
    transcendental: cosine is monotone in cosine^2 =
    n_ab^2 / (n_a * n_b), which ``exact_ratio`` evaluates with
    identical IEEE ops in both engines (a sqrt would be the one
    libm call that can differ by an ulp and flip a rank — the same
    discipline as the rational idf in ``bm25_search``).

    Scale shape: pair counts ride the bounded-fanout basket self-join
    (see module docstring) with the same ``MIN_COPURCHASES``
    significance-and-densification gate as the triangle census; the
    per-item totals dimension is broadcast ONLY under the
    ``broadcast_max_items`` gate (a TPC-H part catalog fits; a
    billions-of-items web catalog would OOM the driver, so it falls
    back to a shuffle join on the already-aggregated totals — one row
    per item, tiny relative to the pair table either way); the final
    top-k is a TakeOrdered over the sparse scored-edge table, never a
    global sort of raw pairs.
    """
    # Per-order basket arrays, as in triangle_stats: one
    # groupBy(orderkey) shuffle (collect_set = the per-order distinct,
    # inside the same exchange) replaces the round-4 distinct() +
    # self-join pair; in-task pair expansion is quadratic only in the
    # bounded basket size. Both item_n and the pair table hang off the
    # same baskets exchange, which Catalyst reuses.
    # NOT checkpointed, deliberately: measured at sf0.1, an eager
    # checkpoint costs a separate job and runs slower than letting
    # both endpoint-join broadcasts build inside the one action (the
    # checkpoint rationale only pays off when consumers would race
    # concurrently, as in the triangle census above).
    baskets = _order_baskets(lineitem)
    item_n = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
    )
    bcast = _item_totals_fit_broadcast(lineitem, item_n, broadcast_max_items)
    hint = F.broadcast if bcast else (lambda d: d)
    pairs = (
        _basket_pair_rows(baskets)
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= F.lit(MIN_COPURCHASES))
    )
    scored = (
        pairs.join(
            hint(
                item_n.select(F.col("l_partkey").alias("p1"), F.col("n").alias("n1"))
            ),
            "p1",
        )
        .join(
            hint(
                item_n.select(F.col("l_partkey").alias("p2"), F.col("n").alias("n2"))
            ),
            "p2",
        )
        .select(
            "p1",
            "p2",
            "n_ab",
            exact_ratio(
                F.col("n_ab") * F.col("n_ab"), F.col("n1") * F.col("n2")
            ).alias("cosine_sq"),
        )
    )
    return scored.orderBy(F.desc("cosine_sq"), "p1", "p2").limit(k)


_ITEM_SIM_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_item AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_ab
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_COPURCHASES}
)
SELECT p1, p2, n_ab,
       {oracle_exact_ratio("n_ab * n_ab", "i1.n * i2.n")} AS cosine_sq
FROM pairs
JOIN n_item i1 ON p1 = i1.l_partkey
JOIN n_item i2 ON p2 = i2.l_partkey
ORDER BY cosine_sq DESC, p1, p2
LIMIT {SIM_TOPK}
"""


@query("item_similarity_cosine", oracle=_ITEM_SIM_SQL)
def q_item_similarity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 part pairs by co-purchase cosine (ties broken by pair id
    so the LIMIT boundary is deterministic in both engines)."""
    return item_similarity_cosine(load_table(spark, sf_dir, "lineitem"))


# --- k-core decomposition (iterative peeling) -----------------------------

KCORE_K = 3
KCORE_MAX_ROUNDS = 50


def _kcore_peel(edges: DataFrame, k: int, max_rounds: int) -> DataFrame:
    """Peel sub-k nodes from a symmetric edge list to the k-core
    fixpoint. Raises ``RuntimeError`` if ``max_rounds`` is exhausted
    before the fixpoint: returning the partially-peeled graph would be
    a silently-wrong k-core for library callers (monotone deletion
    guarantees <= |V| rounds, so a trip here means the budget was set
    below the graph's peel depth, not an algorithmic loop)."""
    for _ in range(max_rounds):
        deg = edges.groupBy("p1").agg(F.count("*").alias("deg"))
        weak = deg.where(F.col("deg") < k).select("p1")
        if weak.limit(1).count() == 0:
            return edges
        edges = (
            edges.join(F.broadcast(weak), "p1", "left_anti")
            .join(
                F.broadcast(weak.select(F.col("p1").alias("p2"))), "p2", "left_anti"
            )
            .localCheckpoint()
        )
    deg = edges.groupBy("p1").agg(F.count("*").alias("deg"))
    if deg.where(F.col("deg") < k).limit(1).count() > 0:
        raise RuntimeError(
            f"kcore peeling did not converge within max_rounds={max_rounds}; "
            f"raise the round budget (peel depth is bounded by |V|)"
        )
    return edges


def kcore_parts(
    lineitem: DataFrame, k: int = KCORE_K, max_rounds: int = KCORE_MAX_ROUNDS
) -> DataFrame:
    """The k-core of the repeat-copurchase graph: the maximal subgraph
    where every node keeps degree >= k — the classic peeling fixpoint
    (repeatedly delete sub-k nodes; deletion can drop neighbors below
    k, so iterate to the unique fixpoint).

    The third iterative-fixpoint pattern in this module, distinct from
    both PageRank (value iteration over a FIXED graph) and connected
    components (alternating-star edge contraction): here the GRAPH
    ITSELF shrinks
    monotonically. Each round is one degree aggregation + one
    broadcast anti-join of the (bounded, only-shrinking) weak-node
    set against the edge list; ``localCheckpoint`` per round truncates
    lineage; the convergence probe is a scalar count (the only
    collect). Monotone deletion guarantees termination in <= |V|
    rounds; real graphs peel in a handful.

    Registered rows-only (data-dependent round count — the documented
    iterative class); the algorithm is pinned against an independent
    pure-Python peeling in tests/test_graph_kcore.py.
    """
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= F.lit(MIN_COPURCHASES))
        .select("p1", "p2")
        .localCheckpoint()
    )
    edges = pairs.union(
        pairs.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    ).localCheckpoint()
    edges = _kcore_peel(edges, k, max_rounds)
    return (
        edges.groupBy("p1")
        .agg(F.count("*").alias("core_degree"))
        .select(F.col("p1").alias("part"), "core_degree")
    )


def _oracle_kcore(rounds: int = 16, k: int = KCORE_K) -> str:
    """Peeling unrolled to a FIXED depth: rounds >= the true peel depth
    of the oracle-scale data (measured: 10 at sf0.01, 2 at sf0.1, 0 at
    sf0.001) makes the fixed unroll equal the fixpoint the Spark loop
    iterates to — the same fixed-unroll trick as the PageRank oracle.
    If the data ever needed more rounds the hashes would go red, not
    silently wrong."""
    steps = []
    prev = "e0"
    for i in range(1, rounds + 1):
        steps.append(f"""w{i} AS MATERIALIZED (
        SELECT p1 FROM (SELECT p1, count(*) AS deg FROM {prev} GROUP BY p1)
        WHERE deg < {k}
    ),
    e{i} AS MATERIALIZED (
        SELECT * FROM {prev}
        WHERE p1 NOT IN (SELECT p1 FROM w{i}) AND p2 NOT IN (SELECT p1 FROM w{i})
    )""")
        prev = f"e{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MIN_COPURCHASES}
    ),
    e0 AS MATERIALIZED (SELECT p1, p2 FROM pairs UNION ALL SELECT p2, p1 FROM pairs),
    {chain}
    SELECT p1 AS part, count(*) AS core_degree FROM {prev} GROUP BY p1
    """


@query("kcore_parts", oracle=_oracle_kcore())
def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Members of the 3-core of the repeat-copurchase graph with their
    within-core degree."""
    return kcore_parts(load_table(spark, sf_dir, "lineitem"))
