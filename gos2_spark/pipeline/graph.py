"""Link-graph PageRank over web domains (host-level authority scoring for
crawl prioritization and quality weighting).

Scale shape (10^9 domains, 10^11 edges):

* out-degrees are computed ONCE and joined into the edge table up front,
  so each power iteration is exactly one shuffle-join (ranks on src) plus
  one map-side-combined groupBy (contributions on dst);
* ranks are re-persisted per iteration and the previous iteration is
  unpersisted — lineage stays O(1) deep, and ``materialize`` can be swapped
  for a reliable checkpoint on long chains (same pattern as
  pipeline.dedup.minhash_dedup_groups);
* dangling mass (nodes with no out-edges) is collected as ONE scalar
  aggregate per iteration and redistributed uniformly — never a join;
* iteration count is fixed (training-pipeline PageRank runs a handful of
  iterations, not to convergence), which keeps the whole computation a
  statically unrollable DAG — the DuckDB oracle replays it as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize=None,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power iterations.

    ``edges`` is a DISTINCT (src, dst) edge list; the node set is the union
    of both endpoints; ranks start uniform at 1/N and sum to 1 after every
    iteration (dangling mass redistributed uniformly).
    """
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if materialize is not None:
        nodes = materialize(nodes)
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # one join up front; every iteration reuses this weighted edge table
    weighted = edges.join(out_deg, "src").select(
        "src", "dst", (1.0 / F.col("out_deg")).alias("w")
    )
    if materialize is not None:
        weighted = materialize(weighted)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            weighted.join(ranks, weighted["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # dangling mass = 1 - mass that flowed along edges (exact: ranks
        # sum to 1), one scalar aggregate instead of an anti-join
        flowed = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_semi")
            .agg(F.sum("rank"))
            .collect()[0][0]
        ) or 0.0
        dangling = 1.0 - flowed
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if materialize is not None:
            ranks = materialize(ranks)
    return ranks
