from __future__ import annotations

from mcp_vector_search_spark.operators.kg import (
    build_nodes,
    call_edges,
    entity_resolve,
    tag_query,
)


def _chunks(spark):
    rows = [
        ("c1", "parse_file", "function", "src/parser.py", ["tokenize", "log"]),
        ("c2", "tokenize", "function", "src/lexer.py", ["log"]),
        ("c3", "log", "function", "src/util.py", []),
        ("c4", "tokenize", "function", "src/parser.py", []),  # same file as c1
    ]
    return spark.createDataFrame(
        rows, "chunk_id string, name string, chunk_type string, file_path string, calls array<string>"
    )


def test_call_edges_cross_file(spark):
    got = {(r.src, r.dst) for r in call_edges(_chunks(spark)).collect()}
    # c1 calls tokenize → c2 (cross-file) but NOT c4 (same file);
    # c1→log(c3), c2→log(c3)
    assert got == {("c1", "c2"), ("c1", "c3"), ("c2", "c3")}


def test_entity_resolve_tier_ladder(spark):
    nodes = build_nodes(_chunks(spark))
    exact = [r.name for r in entity_resolve(nodes, "tokenize").collect()]
    assert exact == ["tokenize", "tokenize"]  # exact tier beats substring
    prefix = {r.name for r in entity_resolve(nodes, "parse").collect()}
    assert prefix == {"parse_file"}


def test_tag_query_and_semantics(spark):
    tags = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (3, "b"), (3, "c")],
        "doc_id long, tag string",
    )
    got = sorted(r.doc_id for r in tag_query(tags, ["a", "b"]).collect())
    assert got == [1, 3]
