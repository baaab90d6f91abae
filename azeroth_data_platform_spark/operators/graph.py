"""Graph analytics over relational data: co-purchase PageRank.

The engine's ITERATIVE-algorithm pattern (the kmeans_centroids precedent,
operators/similarity.py) applied to a graph: power iteration is k rounds
of (equi-join + groupBy) over an edge relation — exactly the shape GraphX /
Pregel compile to, expressed directly in DataFrame algebra so Catalyst
handles distribution. The graph here is the co-purchase item graph
(items sharing an order basket), the classic recommendation substrate.

Determinism (the repo's invariant): per-node contribution sums accumulate
in DECIMAL(28,14) — exact and associative, so ranks are bit-identical at
any partitioning and in both engines; the damping constants are emitted as
identical double literals on both sides. Iterations are FIXED (3) and the
oracle unrolls them as chained CTEs (the trained-quantizer device), making
the whole iterative computation hash-checkable.

Scale notes: edges build from a basket self-join — fan-out bounded by
basket size (TPC-H ≤ 7 lines/order), distinct'd once and localCheckpointed
so the 3 iterations reread a materialized relation instead of re-running
the self-join; each iteration is one edge-keyed equi-join plus one
dst-keyed groupBy (linear in |E|, skew governed by max in-degree — AQE
territory, same class as the gold aggregates). Rank state is node-sized.

Dangling nodes: none by construction — co-purchase edges are symmetric,
so every node has out-degree ≥ 1 (asserted in tests); the simplified
update r' = (1−d)/N + d·Σ r_u/deg_u is therefore mass-conserving here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lifecycle import materialize

PAGERANK_D = 0.85
PAGERANK_ITERS = 3
_D_LIT = repr(PAGERANK_D)
_BASE_LIT = repr(1.0 - PAGERANK_D)  # emitted identically in both engines


def copurchase_edges(baskets: DataFrame) -> DataFrame:
    """Distinct directed co-purchase edges from (basket_id, item_id) rows.
    Symmetric by construction: (a,b) and (b,a) both appear.

    r12 (guide §2.4): one groupBy(basket_id) + a ROW-LOCAL pair expansion
    replaces the basket self-join — the join shuffled the fact relation
    and sorted both SMJ sides to rediscover rows that already share a
    basket; collecting each basket's (bounded — ≤ basket size) item list
    generates the same pair multiset inside a projection, so the only
    exchanges left are the basket groupBy and the final distinct. The
    per-element HOF lambdas run interpreted, but over ≤ 7-element basket
    arrays that is noise next to the removed join (measured 1.5× at
    sf0.1, identical 2.39M-edge output; same shape at any scale — pair
    fan-out stays bounded by basket size either way).

    r13 (guide §2.3 — shuffle fewer bytes): the expansion emits only the
    CANONICAL src < dst half, the distinct dedupes that half (half the
    rows through the pair exchange and half the per-basket HOF work),
    and the symmetric relation is restored by a ROW-LOCAL mirror union.
    canon ∪ swap(canon) is exactly the old distinct pair set: the set is
    symmetric by construction and the two halves are disjoint, so no
    duplicates and nothing missing — bit-identical consumer results
    (pagerank hash-checked against the unchanged full-join oracle)."""
    canon = (
        baskets.groupBy("basket_id")
        .agg(F.collect_list("item_id").alias("xs"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(xs, a -> transform("
                    "filter(xs, b -> b > a), b -> struct(a AS src, b AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
    )
    return canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


# q15 rank units: 1e15 ≤ 2^53, so the final int→double conversion is
# EXACT; d = 0.85 = 17/20 exactly, so the damping step is pure integer
# arithmetic (17·s DIV 20). The whole iteration is integers end-to-end —
# the r9 fix for the old per-row CAST(r/deg AS DECIMAL(28,14)), whose
# double→decimal rounding is engine-divergent on short-expansion reprs
# (Spark rounds the exact binary, DuckDB the shortest repr; sf0.1 nodes
# hit the class and the divergence compounded over iterations).
PAGERANK_Q = 10**15
assert PAGERANK_D == 0.85  # 17/20 — the integer damping step below


def pagerank(
    edges: DataFrame, d: float = PAGERANK_D, iters: int = PAGERANK_ITERS
) -> DataFrame:
    """(item_id, pagerank) after `iters` power iterations over `edges` —
    deterministic INTEGER arithmetic throughout: ranks live in q15 units
    (BIGINT), per-edge contributions are r_u DIV deg (truncated — the
    documented quantization, identical in both engines on non-negative
    operands), and the update is base_u + 17·s DIV 20. Truncation sheds
    ≤ deg ulps of mass per node per iteration (≤ 1e-15·deg relative),
    the price of a partition-count-independent, engine-exact result."""
    edges = materialize(edges)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # r12: the node set IS the degree table's key set — the input contract
    # is symmetric edges (module docstring; every caller passes
    # copurchase_edges, symmetry pinned in tests/test_graph.py), so every
    # node appears as a src and the old union(src, dst) + distinct paid a
    # second full-edge-relation shuffle for rows the deg groupBy already
    # reduced. nodes/n now read the checkpointed node-sized deg relation.
    # r12: fold deg into the node-sized rank state ONCE (ranks ⋈ deg is
    # node-sized) and join the per-edge contribution value rv =
    # ru DIV deg into the edge scan — each iteration is then ONE join
    # over the checkpointed edges + one map-combined groupBy(dst),
    # instead of two edge-relation joins per round. The rv join is
    # deliberately UN-hinted: nodes are the item catalog (dim-sized
    # relative to the fact table), so the planner broadcasts it from its
    # measured checkpoint size — and degrades to a shuffle join instead
    # of an OOM if a catalog ever outgrows broadcast (the repo's AQE
    # no-cliff pattern). Same integer arithmetic per edge (ru DIV deg
    # computed on the node row instead of the edge row), same
    # associative BIGINT sum — ranks are bit-identical.
    #
    # The node count is ONE scalar of model metadata — collected once
    # (the legitimate tiny-result boundary class) and inlined as a SQL
    # literal, so each iteration's update joins the PREVIOUS checkpointed
    # rank state directly instead of re-deriving nodes ∪ distinct + a
    # count aggregate + two one-row broadcasts per round (ranks always
    # holds exactly one row per node — init from `nodes`, preserved by
    # the left join). Same DIV-by-n BIGINT arithmetic, bit-identical.
    degn = materialize(deg.withColumnRenamed("src", "node"))
    n = degn.count()
    ranks = degn.select(
        "node", F.expr(f"CAST({PAGERANK_Q} AS BIGINT) DIV {n}").alias("ru")
    )
    base_u = f"(CAST({PAGERANK_Q * 3 // 20} AS BIGINT) DIV {n})"  # 0.15/n in q15
    for _ in range(iters):
        rv = ranks.join(degn, "node").select(
            F.col("node").alias("src"), F.expr("ru DIV deg").alias("rv")
        )
        contribs = (
            edges.join(rv, "src")
            .groupBy("dst")
            .agg(F.sum("rv").cast("bigint").alias("s"))
        )
        ranks = materialize(
            ranks.select("node")
            .join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base_u}"
                    " + 17 * coalesce(s, CAST(0 AS BIGINT)) DIV 20 AS BIGINT)"
                ).alias("ru"),
            )
        )
    return ranks.select(
        F.col("node").alias("item_id"),
        (F.col("ru").cast("double") / F.lit(float(PAGERANK_Q))).alias("pagerank"),
    )


def pagerank_sql(iters: int = PAGERANK_ITERS) -> str:
    """DuckDB twin: the fixed iterations unrolled as chained CTEs."""
    ctes = [
        "b AS (SELECT l_orderkey AS basket_id, l_partkey AS item_id FROM lineitem)",
        """e AS (SELECT DISTINCT a.item_id AS src, c.item_id AS dst
             FROM b a JOIN b c ON a.basket_id = c.basket_id
             WHERE a.item_id <> c.item_id)""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({PAGERANK_Q} AS BIGINT) // n AS ru"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""c{i} AS (
        SELECT e.dst AS node, CAST(SUM(p.ru // deg.deg) AS BIGINT) AS s
        FROM e JOIN r{i - 1} p ON e.src = p.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst)""")
        ctes.append(f"""r{i} AS (
        SELECT nodes.node,
               CAST(CAST({PAGERANK_Q * 3 // 20} AS BIGINT) // nn.n
                 + 17 * coalesce(c{i}.s, CAST(0 AS BIGINT)) // 20 AS BIGINT) AS ru
        FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node)""")
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT node AS item_id, CAST(ru AS DOUBLE) / {float(PAGERANK_Q)!r}"
        f" AS pagerank FROM r{iters}"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(item_id, n_triangles): per-node triangle membership counts.

    Degree-ordered orientation (the standard distributed cut, e.g.
    Suri & Vassilvitskii's MR triangle counting): orient every undirected
    edge from the lower to the higher endpoint under the total order
    (degree, id). Each triangle then has exactly one vertex with two
    out-edges, so the wedge-close join counts it once — and out-degrees
    are bounded by O(√m) on ANY degree distribution, which caps the wedge
    volume at Σ out-deg² even when a celebrity node's raw degree explodes
    (pinned under a hot node in tests/test_skew_stress.py). Counts are
    orientation-invariant — the DuckDB oracle keeps the simple id-ordered
    form, so the hash check also verifies the orientation argument.
    """
    # Input contract: `edges` is a DISTINCT directed edge relation (the
    # copurchase_edges output — every caller). The src<dst filter on a
    # distinct symmetric relation is therefore already the canonical
    # undirected edge set; the old extra `.distinct()` here paid a SECOND
    # full shuffle of the pair stream for nothing (r12: Catalyst cannot
    # remove a duplicate Aggregate — it has no distinctness evidence —
    # and it pushes the src<dst predicate below copurchase's own distinct,
    # so exactly one half-sized distinct remains in the executed plan).
    canon = materialize(
        edges.where(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    undirected = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = undirected.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # orientation key: pack (deg, id) into one orderable bigint-pair struct
    keyed = materialize(
        undirected.join(deg, "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("deg_d")),
            "dst",
        )
        .where(
            (F.col("deg") < F.col("deg_d"))
            | ((F.col("deg") == F.col("deg_d")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    # r12 algorithmic pass (guide §2.3 "shuffle keys and metadata instead
    # of payloads", §2.4): the wedge-materializing form (e1 ⋈ e2 on dst=src
    # → Σ out-deg² wedge ROWS through an exchange, then a second join
    # shuffling that stream again on the (src, dst) composite to test
    # closure) is replaced by adjacency-list intersection. Out-neighbor
    # lists are node-sized payloads (Σ sizes = |E|; max size O(√m) under
    # the degree orientation, so no giant row); attaching them to each
    # edge moves the wedge volume ONCE as array payload bytes inside two
    # equi-joins, and the closure test runs row-local as array_intersect
    # inside whole-stage codegen — the Σ out-deg² intermediate never
    # exists as rows and the second wedge-stream shuffle disappears.
    #
    # Exactness: for an oriented edge (u, v), w ∈ adj(u) ∩ adj(v) iff
    # edges (u,v), (u,w), (v,w) all exist — exactly the triangles whose
    # two-out-edge vertex is u, found once (the old e1⋈e2⋈e3 produced the
    # same (a,b,c) = (u,v,w) triple via the wedge u→v→w closed by u→w).
    # adj lists are duplicate-free (keyed is distinct), so the
    # intersection is a set and the exploded member multiset is
    # deterministic regardless of collect_list order. Counts are
    # bit-identical (oracle keeps the id-ordered wedge-join form, so the
    # hash check verifies the restructure independently).
    adj = materialize(
        keyed.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
    )
    tri = (
        keyed.join(adj, "src")
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_d")),
            "dst",
        )
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.explode(F.array_intersect("nbrs", "nbrs_d")).alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("item_id"))
        .groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


TRIANGLES_SQL = """
  WITH b AS (SELECT l_orderkey AS basket_id, l_partkey AS item_id FROM lineitem),
  e AS (SELECT DISTINCT a.item_id AS src, c.item_id AS dst
        FROM b a JOIN b c ON a.basket_id = c.basket_id
        WHERE a.item_id < c.item_id),
  tri AS (SELECT e1.src AS a, e1.dst AS bb, e2.dst AS c
          FROM e e1
          JOIN e e2 ON e1.dst = e2.src
          JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
  m AS (SELECT unnest([a, bb, c]) AS item_id FROM tri)
  SELECT item_id, COUNT(*) AS n_triangles FROM m GROUP BY item_id"""


# --- market-basket association rules ---------------------------------------

MIN_PAIR_SUPPORT = 2  # co-occurrence count floor for a rule to surface


def association_rules(baskets: DataFrame, min_pair: int = MIN_PAIR_SUPPORT) -> DataFrame:
    """Directed association rules a→b over (basket_id, item_id) rows:
    support / confidence / lift — the co-purchase graph's edges upgraded to
    the classic recommendation statistics.

    All counts are exact integers from two groupBys (item counts, pair
    counts); the three ratios combine them in double arithmetic with an
    identical expression tree on both engines (single-rounded IEEE ops ⇒
    bit-identical). support = P(a,b), confidence = P(b|a),
    lift = P(a,b) / (P(a)·P(b)).

    Scale notes: pair generation is the basket self-join (fan-out bounded
    by basket size, the copurchase_edges shape) feeding ONE pair-keyed
    groupBy with map-side combine; item counts and the basket total are
    dim-sized/scalar broadcasts. `min_pair` prunes the long tail before
    the broadcast joins, so rule volume tracks genuinely co-purchased
    pairs, not the pair cross product.
    """
    # r12: `b` fed four branches (basket total, item counts, both
    # self-join sides) — four fact scans + distincts without cross-branch
    # CSE; one narrow materialization folds them (guide §3.3). Pair
    # generation then rides the copurchase_edges row-local expansion
    # instead of the self-join (guide §2.4): identical ordered-pair
    # multiset per basket, one groupBy instead of a sorted SMJ.
    b = materialize(baskets.select("basket_id", "item_id").distinct())
    n_baskets = b.agg(F.count_distinct("basket_id").alias("n_baskets"))
    item_n = b.groupBy("item_id").agg(F.count(F.lit(1)).alias("item_n"))
    pair_n = (
        b.groupBy("basket_id")
        .agg(F.collect_list("item_id").alias("xs"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(xs, a -> transform("
                    "filter(xs, b -> b != a), b -> struct(a AS item_a, b AS item_b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= min_pair)
    )
    na = item_n.select(F.col("item_id").alias("item_a"), F.col("item_n").alias("n_a"))
    nb = item_n.select(F.col("item_id").alias("item_b"), F.col("item_n").alias("n_b"))
    out = (
        pair_n.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    pn = F.col("pair_n").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "pair_n",
        "n_a",
        "n_b",
        (pn / F.col("n_baskets").cast("double")).alias("support"),
        (pn / F.col("n_a").cast("double")).alias("confidence"),
        (
            pn
            * F.col("n_baskets").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )


def association_rules_sql(min_pair: int = MIN_PAIR_SUPPORT) -> str:
    """DuckDB twin of :func:`association_rules` over the lineitem baskets."""
    return f"""
  WITH b AS (SELECT DISTINCT l_orderkey AS basket_id, l_partkey AS item_id FROM lineitem),
  nb AS (SELECT COUNT(DISTINCT basket_id) AS n_baskets FROM b),
  item_n AS (SELECT item_id, COUNT(*) AS item_n FROM b GROUP BY item_id),
  pair_n AS (SELECT l.item_id AS item_a, r.item_id AS item_b, COUNT(*) AS pair_n
             FROM b l JOIN b r ON l.basket_id = r.basket_id
             WHERE l.item_id <> r.item_id
             GROUP BY l.item_id, r.item_id
             HAVING COUNT(*) >= {min_pair})
  SELECT p.item_a, p.item_b, p.pair_n, a.item_n AS n_a, c.item_n AS n_b,
         CAST(p.pair_n AS DOUBLE) / CAST(n.n_baskets AS DOUBLE) AS support,
         CAST(p.pair_n AS DOUBLE) / CAST(a.item_n AS DOUBLE) AS confidence,
         CAST(p.pair_n AS DOUBLE) * CAST(n.n_baskets AS DOUBLE)
           / (CAST(a.item_n AS DOUBLE) * CAST(c.item_n AS DOUBLE)) AS lift
  FROM pair_n p
  JOIN item_n a ON p.item_a = a.item_id
  JOIN item_n c ON p.item_b = c.item_id
  CROSS JOIN nb n"""
