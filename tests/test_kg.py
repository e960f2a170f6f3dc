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


def test_build_ontology_node_types(spark):
    """Document/Topic/ProgrammingLanguage nodes + HAS_TOPIC/WRITTEN_IN
    edges (reference Document-ontology node tables)."""
    from mcp_vector_search_spark.operators.kg import build_ontology

    files = spark.createDataFrame(
        [
            ("README.md", "# Title\nhello world\n## Section\nmore"),
            ("docs/api/client.md", "# API\ncall things"),
            ("src/main.py", "print('hi')"),
        ],
        "path string, text string",
    )
    nodes, edges = build_ontology(files, text_col="text")
    by_type = {
        t: {r.name for r in rows}
        for t, rows in __import__("itertools").groupby(
            sorted(nodes.collect(), key=lambda r: r.entity_type),
            key=lambda r: r.entity_type,
        )
    }
    assert by_type["Document"] == {"README.md", "docs/api/client.md", "src/main.py"}
    assert "Orientation" in by_type["Topic"]  # readme -> Orientation
    assert "API Reference" in by_type["Topic"]  # api_doc -> API Reference
    assert by_type["ProgrammingLanguage"] >= {"python", "markdown"} or by_type[
        "ProgrammingLanguage"
    ]  # extension map decides exact names
    doc_rows = {r.name: r for r in nodes.filter("entity_type = 'Document'").collect()}
    assert doc_rows["README.md"].doc_category == "readme"
    assert doc_rows["README.md"].section_count == 2
    assert doc_rows["docs/api/client.md"].doc_category == "api_doc"
    e = {(r.src, r.dst, r.rel) for r in edges.collect()}
    assert ("doc:README.md", "topic:Orientation", "HAS_TOPIC") in e
    assert any(r == ("doc:src/main.py", "lang:python", "WRITTEN_IN") for r in e)


def test_build_ontology_word_count_trims(spark):
    """split('\\s+') keeps boundary empties: '' must count 0 words and
    padded text must not count phantom words (r6 review)."""
    from mcp_vector_search_spark.operators.kg import build_ontology

    files = spark.createDataFrame(
        [("a.md", ""), ("b.md", "  hi there ")], "path string, text string"
    )
    nodes, _ = build_ontology(files, text_col="text")
    wc = {
        r.name: r.word_count
        for r in nodes.filter("entity_type = 'Document'").collect()
    }
    assert wc == {"a.md": 0, "b.md": 2}


def test_kg_boost_case_insensitive(spark):
    """Query terms arrive lowercased; capitalized node names must still
    boost (r6 review)."""
    from mcp_vector_search_spark.operators.kg import kg_boost

    hits = spark.createDataFrame([(1, 0.5), (2, 0.5)], "doc_id long, score double")
    edges = spark.createDataFrame([(1, 10), (2, 20)], "src long, dst long")
    nodes = spark.createDataFrame(
        [(10, "Vector"), (20, "unrelated")], "id long, name string"
    )
    got = {
        r.doc_id: r.boosted_score
        for r in kg_boost(hits, edges, nodes, ["vector"]).collect()
    }
    assert got == {1: 0.52, 2: 0.5}


def test_detect_frameworks(spark):
    from mcp_vector_search_spark.operators.kg import detect_frameworks

    deps = spark.createDataFrame(
        [("fastapi>=0.100.0",), ("pytest==8.0",), ("numpy[all]>=2",), ("leftpad",)],
        "dep string",
    )
    got = {r.id: (r.name, r.category) for r in detect_frameworks(deps).collect()}
    assert got == {
        "framework:fastapi": ("FastAPI", "web"),
        "framework:pytest": ("pytest", "testing"),
        "framework:numpy": ("NumPy", "scientific"),
    }


def test_section_nodes(spark):
    from mcp_vector_search_spark.operators.kg import section_nodes

    files = spark.createDataFrame(
        [("README.md", "# Title\nbody\n## Install\nsteps\nnot # a heading")],
        "path string, text string",
    )
    nodes, edges = section_nodes(files)
    got = {(r.name, r.level) for r in nodes.collect()}
    assert got == {("Title", 1), ("Install", 2)}
    e = edges.collect()
    assert all(r.rel == "CONTAINS_SECTION" and r.src == "doc:README.md" for r in e)
    assert len(e) == 2
