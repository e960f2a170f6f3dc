"""Connected components / dup_clusters (operators/components.py):
transitive closure correctness, chain convergence past the
checkpoint boundary, and keeper semantics."""

from __future__ import annotations


def test_two_components(spark):
    from mcp_vector_search_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges(spark):
    """A 20-node chain needs ~19 propagation rounds worst-case with
    one-sided edges, but symmetrized propagation halves the diameter
    per round from both ends; must converge within max_iters and
    label everything with the chain min."""
    from mcp_vector_search_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 120)], "doc_a long, doc_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == 21
    assert all(r.component == 100 for r in rows)


def test_dup_clusters_keeper(spark):
    from mcp_vector_search_spark.operators.components import dup_clusters

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (40, 41)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in dup_clusters(pairs).collect()}
    assert rows[5].cluster_rep == 5 and rows[5].is_keeper
    assert rows[7].cluster_rep == 5 and not rows[7].is_keeper
    assert rows[9].cluster_size == 3
    assert rows[40].is_keeper and rows[41].cluster_size == 2
    # dedup action: exactly one keeper per cluster
    keepers = [r for r in rows.values() if r.is_keeper]
    assert len(keepers) == 2


def test_driver_and_distributed_paths_agree(spark):
    """r12 count-routing: the driver-side union-find (small graphs)
    and the distributed min-label loop must produce identical rows —
    the commit_closure cross-check pattern. Random-ish graph with
    chains, a cycle, self-contained pairs, and string ids too."""
    from mcp_vector_search_spark.operators.components import connected_components

    edges = (
        [(i, i + 1) for i in range(0, 30, 3)]
        + [(100, 101), (101, 102), (102, 100)]  # cycle
        + [(7, 200), (200, 7)]  # mutual pair
        + [(500, 500)]  # self-loop
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    drv = {(r.node, r.component)
           for r in connected_components(pairs, driver_max_edges=10**6).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(pairs, driver_max_edges=0).collect()}
    assert drv == dist and drv

    spairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    drv_s = {(r.node, r.component)
             for r in connected_components(spairs, driver_max_edges=10**6).collect()}
    dist_s = {(r.node, r.component)
              for r in connected_components(spairs, driver_max_edges=0).collect()}
    assert drv_s == dist_s == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")
    }
