from __future__ import annotations

from mcp_vector_search_spark.operators.graph import (
    cycle_nodes,
    trace_paths,
    unreachable_nodes,
)
from mcp_vector_search_spark.sources.discovery import discover


def test_cycle_nodes(spark):
    #  a→b→a (2-cycle), c→d→e (chain), f→f (self-loop)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "e"), ("f", "f")],
        "src string, dst string",
    )
    got = sorted(r.id for r in cycle_nodes(e, max_len=4).collect())
    assert got == ["a", "b", "f"]


def test_unreachable_nodes(spark):
    e = spark.createDataFrame(
        [("main", "a"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    entries = spark.createDataFrame([("main",)], "id string")
    got = sorted(r.id for r in unreachable_nodes(e, entries, max_hops=5).collect())
    assert got == ["x", "y"]


def test_trace_paths_cycle_rejection(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
    )
    got = {(r.path, r.depth) for r in trace_paths(e, "a", max_depth=3).collect()}
    assert ("|a|b|", 1) in got
    assert ("|a|b|c|", 2) in got
    # a→b→a rejected by the per-path cycle check
    assert all("|a|b|a|" not in p for p, _ in got)


def test_trace_paths_rejects_start_self_loop(spark):
    """The FIRST hop applies the same cycle rejection as later hops: a
    self-loop on the start node must not emit |a|a| (r6 review)."""
    e = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src string, dst string"
    )
    got = {(r.path, r.depth) for r in trace_paths(e, "a", max_depth=3).collect()}
    assert got == {("|a|b|", 1)}


def test_discovery_filters_and_language(spark):
    files = spark.createDataFrame(
        [
            (1, "src/app.py"),
            (2, "node_modules/pkg/index.js"),
            (3, "lib/vendor.min.js"),
            (4, "README.md"),
            (5, ".git/config"),
            (6, "src/lib.rs"),
        ],
        "doc_id long, path string",
    )
    got = {r.path: r.language for r in discover(files).collect()}
    assert got == {"src/app.py": "python", "README.md": "markdown", "src/lib.rs": "rust"}


def test_subproject_detection_and_assignment(spark):
    """Monorepo semantics: marker files open subproject roots (not at
    the repo top level, not under excluded dirs); every file maps to
    its NEAREST enclosing root; files outside all roots get null."""
    from mcp_vector_search_spark.sources.discovery import (
        assign_subprojects,
        subproject_roots,
    )

    listing = spark.createDataFrame(
        [
            ("package.json",),               # top level: NOT a subproject
            ("pkgs/app/package.json",),
            ("pkgs/app/native/Cargo.toml",), # nested root inside app
            ("tests/fix/package.json",),     # excluded dir: ignored
            ("pkgs/app/src/main.js",),
            ("pkgs/app/native/lib.rs",),
            ("README.md",),                  # outside every root
        ],
        "path string",
    )
    roots = {(r.root_dir, r.subproject) for r in subproject_roots(listing).collect()}
    assert roots == {("pkgs/app", "app"), ("pkgs/app/native", "native")}

    out = {
        r.path: r.subproject
        for r in assign_subprojects(listing, subproject_roots(listing)).collect()
    }
    assert out["pkgs/app/src/main.js"] == "app"
    assert out["pkgs/app/native/lib.rs"] == "native"  # nearest root wins
    assert out["README.md"] is None
