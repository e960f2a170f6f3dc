from __future__ import annotations

from mcp_vector_search_spark.operators.graph import (
    bfs_min_hops,
    call_graph,
    degree,
    instability,
)


def _edges(spark):
    #  a → b → c → a  (cycle)   b → d,  e isolated target: d → e
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "e")]
    return spark.createDataFrame(rows, "src string, dst string")


def test_bfs_min_hops_cycle_safe(spark):
    e = _edges(spark)
    start = spark.createDataFrame([("a",)], "id string")
    got = {r.id: r.hop for r in bfs_min_hops(e, start, max_hops=4).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 2, "e": 3}


def test_bfs_respects_max_hops(spark):
    e = _edges(spark)
    start = spark.createDataFrame([("a",)], "id string")
    got = {r.id: r.hop for r in bfs_min_hops(e, start, max_hops=1).collect()}
    assert got == {"a": 0, "b": 1}


def test_degree_and_instability(spark):
    e = _edges(spark)
    d = {r.id: (r.out_degree, r.in_degree) for r in degree(e).collect()}
    assert d["b"] == (2, 1) and d["e"] == (0, 1)
    i = {r.id: r.instability for r in instability(e).collect()}
    assert i["e"] == 0.0 and abs(i["b"] - 2 / 3) < 1e-6


def test_call_graph_both_directions(spark):
    e = _edges(spark)
    got = {(r.id, r.direction) for r in call_graph(e, "b").collect()}
    assert got == {("c", "callee"), ("d", "callee"), ("a", "caller")}
