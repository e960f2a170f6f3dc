"""Schema versioning (§1.3 / reference core/schema.py), additive
evolution, export renderers (K5), and the guarded real-model paths
(F11/F12) — each provable in this container even without the model
wheels."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mcp_vector_search_spark import io


def test_upsert_stamps_schema_version(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    io.upsert_parquet(spark, df, path, ["id"])
    assert io.read_schema_version(path) == io.SCHEMA_VERSION
    assert io.check_schema_version(path)
    # version mismatch → caller must rebuild (reference resets)
    io.write_schema_version(path, io.SCHEMA_VERSION + 1)
    assert not io.check_schema_version(path)
    # the marker must not break the parquet scan
    assert spark.read.parquet(path).count() == 1


def test_read_evolved_adds_missing_columns(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(path)
    got = io.read_evolved(spark, path, "id long, v string, score double, tag string")
    assert got.columns == ["id", "v", "score", "tag"]
    row = got.collect()[0]
    assert row.id == 1 and row.score is None and row.tag is None
    assert dict(got.dtypes)["score"] == "double"
    # extra on-disk columns are dropped
    narrowed = io.read_evolved(spark, path, "id long")
    assert narrowed.columns == ["id"]


def test_export_markdown(spark, tmp_path):
    out = str(tmp_path / "r.md")
    df = spark.createDataFrame([(1, "alpha", 0.9), (2, None, 0.5)], "id long, name string, s double")
    io.export_results(df, out, fmt="md")
    text = open(out).read().splitlines()
    assert text[0] == "| id | name | s |"
    assert text[1] == "| --- | --- | --- |"
    assert "| 1 | alpha | 0.9 |" in text
    assert "| 2 |  | 0.5 |" in text  # null renders empty


def test_export_d3_subgraph(spark, tmp_path):
    out = str(tmp_path / "g.json")
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1)], "src string, dst string, weight long"
    )
    io.export_results(edges, out, fmt="d3")
    payload = json.load(open(out))
    assert {n["id"] for n in payload["nodes"]} == {"a", "b", "c"}
    assert {"source": "a", "target": "b", "value": 2} in payload["links"]


def test_embed_batch_fallback_and_guarded_model(spark):
    """With the model library absent (this container), embed_batch with
    a model_name must FALL BACK to the deterministic fake — proving the
    guard; with the library present it would load the real encoder
    (skip-if-absent branch below)."""
    from mcp_vector_search_spark.functions.embed import (
        embed_batch,
        fake_embed_expr,
        load_sentence_transformer,
    )

    docs = spark.createDataFrame([(1, "alpha beta"), (2, "gamma")], "doc_id long, text string")
    expected = {
        r.doc_id: r.e for r in docs.select("doc_id", fake_embed_expr("text", 4).alias("e")).collect()
    }
    got = {r.doc_id: r.embedding for r in embed_batch(docs, dim=4, model_name="all-MiniLM-L6-v2").collect()}
    if load_sentence_transformer("all-MiniLM-L6-v2") is None:
        assert got == expected  # guard fell back to the fake
    else:  # pragma: no cover - env with wheels
        assert all(len(v) > 4 for v in got.values())


def test_cross_encoder_guarded_fallback(spark):
    from mcp_vector_search_spark.plans.search import (
        cross_encoder_rescore,
        load_cross_encoder,
    )

    cand = spark.createDataFrame(
        [(1, 0.5, "data fast word"), (2, 0.4, "nothing relevant")],
        "doc_id long, rescored double, content string",
    )
    base = {r.doc_id: r.ce_score for r in cross_encoder_rescore(cand, "data fast").collect()}
    guarded = {
        r.doc_id: r.ce_score
        for r in cross_encoder_rescore(
            cand, "data fast", model_name="cross-encoder/ms-marco-MiniLM-L-6-v2"
        ).collect()
    }
    if load_cross_encoder("cross-encoder/ms-marco-MiniLM-L-6-v2") is None:
        assert guarded == base  # guard fell back to the deterministic path
    assert base[1] > base[2]  # overlapping content outranks non-overlapping


def test_embed_batch_string_ids(spark):
    from mcp_vector_search_spark.functions.embed import embed_batch

    docs = spark.createDataFrame([("c1", "alpha")], "doc_id string, text string")
    got = embed_batch(docs, dim=4).collect()
    assert got[0].doc_id == "c1" and len(got[0].embedding) == 4


def test_export_html(spark, tmp_path):
    out = str(tmp_path / "r.html")
    df = spark.createDataFrame([(1, "<b>&x")], "id long, name string")
    io.export_results(df, out, fmt="html")
    text = open(out).read()
    assert "<th>id</th><th>name</th>" in text
    assert "<td>1</td><td>&lt;b&gt;&amp;x</td>" in text  # escaped


def test_upsert_delta_guarded_fallback(spark, tmp_path):
    """delta-spark absent here → the MERGE path must fall back to the
    parquet upsert and say so; with delta installed the same call runs
    a real MERGE (the dispatch return value proves which)."""
    path = str(tmp_path / "dt")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    which = io.upsert_delta(spark, a, path, ["id"])
    b = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    which2 = io.upsert_delta(spark, b, path, ["id"])
    assert which == which2
    try:
        import delta  # noqa: F401

        assert which == "delta"  # pragma: no cover - env with delta
    except ImportError:
        assert which == "parquet"
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
