from __future__ import annotations

import datetime as dt

from mcp_vector_search_spark.operators.analytics import (
    hotspots,
    quality_score,
    source_rollup,
)
from mcp_vector_search_spark.operators.events import lag_delta, sessionize


def _docs_with_meta(spark):
    rows = [
        (0, "short text", "en", "s1", 100),
        (1, "x " * 200, "en", "s1", 400),
        (2, "y", "de", "s2", 500),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_source_rollup_grades(spark):
    got = {r.source: (r.grade, r.health) for r in source_rollup(_docs_with_meta(spark)).collect()}
    assert got["s1"] == ("B", 85)  # avg 250 → B
    assert got["s2"] == ("F", 40)  # avg 500 → F


def test_hotspots_rank(spark):
    got = hotspots(_docs_with_meta(spark), n=1).collect()
    top = {(r.lang): r.doc_id for r in got}
    assert top == {"en": 1, "de": 2}


def test_quality_score_bounds(spark):
    got = {r.doc_id: r.quality for r in quality_score(_docs_with_meta(spark)).collect()}
    assert all(0.0 <= q <= 100.0 for q in got.values())
    assert got[0] > 50.0  # clean short prose scores above base


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.0),
        (2, t0 + dt.timedelta(minutes=10), 7, "click", 3.0),
        (3, t0 + dt.timedelta(minutes=50), 7, "click", 10.0),  # 40min gap → new session
        (4, t0, 8, "view", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_sessionize_gap(spark):
    got = {r.user_id: (r.n_sessions, r.n_events) for r in sessionize(_events(spark)).collect()}
    assert got == {7: (2, 3), 8: (1, 1)}


def test_lag_delta(spark):
    got = {r.event_id: r.delta for r in lag_delta(_events(spark)).collect()}
    assert got[1] is None and got[2] == 2.0 and got[3] == 7.0 and got[4] is None


def test_codebase_profile_bands_and_type(spark):
    """Size bands and the type ladder follow the reference's
    thresholds: a doc-heavy listing classifies documentation; a
    py-dominant one python; preset columns follow the size band."""
    from mcp_vector_search_spark.operators.analytics import codebase_profile

    docs_heavy = spark.createDataFrame(
        [(f"docs/d{i}.md",) for i in range(40)]
        + [(f"src/s{i}.py",) for i in range(60)],
        "path string",
    )
    r = codebase_profile(docs_heavy).first()
    assert r.size_category == "small" and r.codebase_type == "documentation"
    assert r.batch_size == 16 and r.parallel_embeddings is False
    assert r.code_only is False

    py_heavy = spark.createDataFrame(
        [(f"src/s{i}.py",) for i in range(70)]
        + [(f"web/w{i}.js",) for i in range(20)]
        + [("README.md",), ("Makefile",)],  # no-ext file counts in total
        "path string",
    )
    r2 = codebase_profile(py_heavy).first()
    assert r2.codebase_type == "python" and r2.n_files == 92


def test_halstead_metrics_small_function(spark):
    """Halstead counts on a concrete snippet: derived metrics follow
    HalsteadMetrics.from_counts exactly (V = N·log2(n),
    D = n1/2 · N2/n2, E = D·V)."""
    import math

    from mcp_vector_search_spark.sources.code_chunker import halstead_metrics

    df = spark.createDataFrame(
        [(1, "def add(a, b):\n  return a + b")], "doc_id long, chunk_text string"
    )
    r = halstead_metrics(df, id_cols=["doc_id"]).first()
    # operators: def, return (keywords) + ( ) : , + symbols
    # operands: add, a, b (a and b appear twice each)
    assert r.n2 == 3 and r.total_operands == 5
    assert r.n1 >= 4 and r.total_operators >= r.n1
    n, N = r.vocabulary, r.length
    assert abs(r.volume - N * math.log2(n)) < 1e-6
    assert abs(r.difficulty - (r.n1 / 2) * (r.total_operands / r.n2)) < 1e-6
    # effort is rounded from UNROUNDED D·V, so compare loosely
    assert abs(r.effort - r.difficulty * r.volume) < 1e-3
    assert r.estimated_bugs == round(r.volume / 3000.0, 6)


def test_halstead_empty_text_guards(spark):
    from mcp_vector_search_spark.sources.code_chunker import halstead_metrics

    df = spark.createDataFrame([(1, "")], "doc_id long, chunk_text string")
    r = halstead_metrics(df, id_cols=["doc_id"]).first()
    assert r.volume == 0.0 and r.difficulty == 0.0 and r.effort == 0.0


def test_directory_rollup_root_files(spark):
    """A root-level path has no ancestor directories: Spark's
    sequence(1, 0) counts DOWN, so root files used to emit themselves
    and '' as fake directories (r6 review)."""
    from mcp_vector_search_spark.operators.smells import directory_rollup

    files = spark.createDataFrame(
        [("README.md", 10), ("src/a.py", 20), ("src/sub/b.py", 30)],
        "path string, n_chars long",
    )
    got = {r.dir: (r.n_files, r.total_chars) for r in directory_rollup(files).collect()}
    assert got == {"src": (2, 50), "src/sub": (1, 30)}


def test_detect_smells_without_n_chars(spark):
    """detect_smells advertises (docs, id_col, text_col) — a frame
    without the corpus n_chars column must fall back to length(text)
    instead of UNRESOLVED_COLUMN (r6 review)."""
    from mcp_vector_search_spark.operators.smells import LONG_DOC_CHARS, detect_smells

    docs = spark.createDataFrame(
        [(1, "word " * (LONG_DOC_CHARS // 4)), (2, "short")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.smell) for r in detect_smells(docs).collect()}
    assert (1, "long_doc") in got
    assert all(d != 2 or s != "long_doc" for d, s in got)
