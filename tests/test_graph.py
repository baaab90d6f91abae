"""PageRank invariants (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import graph


def _toy_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_mass_conserved_and_hub_ranks_highest(spark):
    """Star graph: the center receives every leaf's full rank and must rank
    highest; total mass stays ≈ 1 (conservation holds because the graph is
    symmetric — no dangling mass)."""
    leaves = list(range(1, 6))
    pairs = [(0, v) for v in leaves] + [(v, 0) for v in leaves]
    ranks = {r.item_id: r.pagerank for r in graph.pagerank(_toy_edges(spark, pairs)).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[0] == max(ranks.values())
    assert all(ranks[0] > ranks[v] for v in leaves)
    # leaves are symmetric — identical rank, bit-for-bit
    assert len({ranks[v] for v in leaves}) == 1


def test_pagerank_bit_identical_across_partitionings(spark, sf_dir):
    """The decimal-accumulated contributions make ranks independent of the
    physical partitioning — the repo's reproducibility invariant."""
    from azeroth_data_platform_spark.operators.adapters import read_table

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket_id"), F.col("l_partkey").alias("item_id")
    )
    e = graph.copurchase_edges(baskets)
    r3 = {r.item_id: r.pagerank for r in graph.pagerank(e.repartition(3)).collect()}
    r24 = {r.item_id: r.pagerank for r in graph.pagerank(e.repartition(24)).collect()}
    assert r3 == r24


def test_copurchase_edges_symmetric_no_dangling(spark, sf_dir):
    """Co-purchase edges are symmetric, so every node has out-degree ≥ 1 —
    the precondition for the simplified (no dangling-mass) update."""
    from azeroth_data_platform_spark.operators.adapters import read_table

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket_id"), F.col("l_partkey").alias("item_id")
    )
    e = graph.copurchase_edges(baskets).cache()
    try:
        flipped = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        assert e.exceptAll(flipped).count() == 0
        srcs = e.select("src").distinct()
        dsts = e.select(F.col("dst").alias("src")).distinct()
        assert dsts.exceptAll(srcs).count() == 0
    finally:
        e.unpersist()


def test_triangle_counts_on_known_graphs(spark):
    """K4 has 4 triangles (3 per node); a square (4-cycle) has none; a
    square with one diagonal has 2 triangles, diagonal nodes in both."""
    def tri(pairs):
        e = _toy_edges(spark, pairs + [(b, a) for a, b in pairs])
        return {r.item_id: r.n_triangles for r in graph.triangle_counts(e).collect()}

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert tri(k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    square = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert tri(square) == {}
    diag = square + [(0, 2)]
    assert tri(diag) == {0: 2, 2: 2, 1: 1, 3: 1}
