"""Graph traversal as iterative DataFrame self-joins (reference §2.9,
``core/knowledge_graph.py`` G2-G5 — Cypher over KuzuDB re-expressed as
frontier BFS).

Each hop is one equi-join frontier ⋈ edges on src; the frontier stays
small relative to the edge table, so we broadcast it when under the
threshold. Cycle safety comes from the min-hop aggregation (a node is
kept at its first discovery depth), mirroring the reference's
visited-set BFS (``knowledge_graph.py:3190-3385``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_min_hops(
    edges: DataFrame,
    start_ids: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """All nodes reachable from `start_ids(id)` within `max_hops` →
    (id, hop = first-discovery depth). Start nodes have hop 0.

    `max_hops` rounds of join+union; each round dedupes by min hop so
    the frontier never regrows through cycles. Hops are bounded small
    (reference caps at 8), so the loop unrolls into one Catalyst plan.
    """
    visited = start_ids.select(F.col("id"), F.lit(0).alias("hop"))
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            F.broadcast(frontier.select(F.col("id").alias(src_col)))
            .join(edges, src_col)
            .select(F.col(dst_col).alias("id"), F.lit(h).alias("hop"))
            .distinct()
        )
        # keep only first-time discoveries
        frontier = nxt.join(visited.select("id"), "id", "left_anti").distinct()
        visited = visited.unionByName(frontier)
        visited = visited.groupBy("id").agg(F.min("hop").alias("hop"))
    return visited


def degree(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(id, out_degree, in_degree) — coupling-style metrics (reference
    A7 efferent/afferent, ``analysis/collectors/coupling.py``)."""
    out_d = edges.groupBy(F.col(src_col).alias("id")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col(dst_col).alias("id")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "id", "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
    )
