from __future__ import annotations

import os

from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.embed import (
    embed_batch,
    embed_with_cache,
    fake_embed_expr,
)
from mcp_vector_search_spark.io import export_results, upsert_parquet


def test_expr_and_batch_embeddings_agree(spark, docs):
    expr = {
        r.doc_id: r.e
        for r in docs.select("doc_id", fake_embed_expr("text", 4).alias("e")).collect()
    }
    batch = {r.doc_id: r.embedding for r in embed_batch(docs, dim=4).collect()}
    assert expr == batch


def test_embed_with_cache_skips_hits(spark, docs):
    cache0 = spark.createDataFrame([], "fingerprint string, embedding array<double>")
    emb1, cache1 = embed_with_cache(docs, cache0)
    emb1.count()
    cache1 = cache1.cache()
    # docs 0 and 1 share identical text → one cache entry per distinct content
    assert cache1.count() == docs.select(F.col("text")).distinct().count()
    # second run: all hits, inferred leg is empty
    emb2, cache2 = embed_with_cache(docs, cache1)
    assert emb2.count() == docs.count()
    assert cache2.count() == cache1.count()


def test_upsert_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    upsert_parquet(spark, v1, path, ["id"])
    v2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    upsert_parquet(spark, v2, path, ["id"])
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_export_results(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    p = str(tmp_path / "out_json")
    export_results(df, p, "json")
    assert spark.read.json(p).count() == 1
    p2 = str(tmp_path / "out_csv")
    export_results(df, p2, "csv")
    assert spark.read.option("header", True).csv(p2).count() == 1
