"""Large-star/small-star connected components: correctness on known
topologies and the logarithmic round bound on chain graphs (the case
plain min-label propagation needs O(diameter) rounds for)."""

from pyspark.sql import functions as F

from unfurl_spark.operators.queries import _cc_star_contraction


def _components(spark, edge_pairs):
    edges = spark.createDataFrame(edge_pairs, "src long, dst long")
    stars, rounds = _cc_star_contraction(spark, edges)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct())
    labels = (nodes.join(stars.withColumnRenamed("src", "node"),
                         "node", "left")
              .select("node", F.coalesce("dst", "node").alias("label"))
              .collect())
    comp = {}
    for r in labels:
        comp.setdefault(r["label"], set()).add(r["node"])
    return set(frozenset(s) for s in comp.values()), rounds


def test_chain_converges_in_log_rounds(spark):
    # a 256-node chain: min-label propagation needs ~256 rounds;
    # star contraction must stay logarithmic
    n = 256
    comps, rounds = _components(spark, [(i, i + 1) for i in range(n - 1)])
    assert comps == {frozenset(range(n))}
    assert rounds <= 12, rounds  # O(log^2 n), not O(n)


def test_disjoint_components_and_star_skew(spark):
    pairs = [(0, i) for i in range(1, 50)]          # hub star
    pairs += [(100, 101), (101, 102)]               # path
    pairs += [(200, 201)]                           # pair
    comps, rounds = _components(spark, pairs)
    assert comps == {frozenset(range(50)),
                     frozenset({100, 101, 102}),
                     frozenset({200, 201})}
    assert rounds <= 6


def test_self_loops_and_duplicates_ignored(spark):
    comps, _ = _components(
        spark, [(1, 1), (1, 2), (2, 1), (2, 3), (2, 3), (7, 7)])
    # 7 only appears in a self-loop → dropped with its loop
    assert frozenset({1, 2, 3}) in comps
