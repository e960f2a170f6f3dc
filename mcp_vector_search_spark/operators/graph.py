"""Graph traversal as iterative DataFrame self-joins (reference §2.9,
``core/knowledge_graph.py`` G2-G5 — Cypher over KuzuDB re-expressed as
frontier BFS).

Each hop is one equi-join frontier ⋈ edges on src. Cycle safety comes
from the min-hop aggregation (a node is kept at its first discovery
depth), mirroring the reference's visited-set BFS
(``knowledge_graph.py:3190-3385``).

Scale notes: the frontier join is left to AQE/cost-based planning — no
forced broadcast hint (a dense-graph frontier can approach the node
set; a forced hint would bypass autoBroadcastJoinThreshold and OOM the
driver). Lineage growth across hops is bounded by `checkpoint_every`:
the unrolled plan is truncated with localCheckpoint so an 8-hop
traversal at 100× scale doesn't replay 8 nested shuffles per action.
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
    checkpoint_every: int | None = 4,
) -> DataFrame:
    """All nodes reachable from `start_ids(id)` within `max_hops` →
    (id, hop = first-discovery depth). Start nodes have hop 0.

    `max_hops` rounds of join+union; each round dedupes by min hop so
    the frontier never regrows through cycles. Hops are bounded small
    (reference caps at 8), so the loop unrolls into one Catalyst plan,
    truncated every `checkpoint_every` hops.
    """
    visited = start_ids.select(F.col("id"), F.lit(0).alias("hop"))
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.select(F.col("id").alias(src_col))
            .join(edges, src_col)
            .select(F.col(dst_col).alias("id"), F.lit(h).alias("hop"))
            .distinct()
        )
        # keep only first-time discoveries
        frontier = nxt.join(visited.select("id"), "id", "left_anti").distinct()
        visited = visited.unionByName(frontier)
        visited = visited.groupBy("id").agg(F.min("hop").alias("hop"))
        if checkpoint_every and h % checkpoint_every == 0 and h < max_hops:
            visited = visited.localCheckpoint(eager=False)
            frontier = frontier.localCheckpoint(eager=False)
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


def instability(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Coupling instability I = Ce/(Ce+Ca) per node (reference A7,
    ``analysis/metrics.py:121-162``): efferent = out-degree (what I
    depend on), afferent = in-degree (who depends on me). I→1 means
    unstable (easy to change, nothing depends on it), I→0 rigid."""
    return degree(edges, src_col, dst_col).withColumn(
        "instability",
        F.round(
            F.col("out_degree")
            / F.greatest(F.lit(1.0), (F.col("out_degree") + F.col("in_degree")).cast("double")),
            6,
        ),
    )


def call_graph(
    edges: DataFrame, node_id: str, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Callers ∪ callees of one node (reference G3,
    ``knowledge_graph.py:3141-3188``): two edge-direction scans
    unioned, tagged with direction. Both scans prune on an equality
    predicate that pushes into the edge store."""
    callees = edges.filter(F.col(src_col) == node_id).select(
        F.col(dst_col).alias("id"), F.lit("callee").alias("direction")
    )
    callers = edges.filter(F.col(dst_col) == node_id).select(
        F.col(src_col).alias("id"), F.lit("caller").alias("direction")
    )
    return callees.unionByName(callers).distinct()
