from __future__ import annotations

from pyspark.sql import functions as F

from mcp_vector_search_spark import io
from mcp_vector_search_spark.operators.topk import knn_brute_force

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_pushes_filter_and_prunes_columns(spark):
    df = io.table(spark, SF_DIR, "documents").filter(F.col("lang") == "en").select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # projection pruned to the two referenced columns only
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_knn_broadcasts_query_side(spark):
    emb = io.table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("query_vec"))
    plan = _plan(knn_brute_force(emb, q, 10))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the big scan side must not shuffle: top-k is TakeOrderedAndProject
    assert "TakeOrderedAndProject" in plan


def test_bm25_no_cartesian(spark):
    from mcp_vector_search_spark.operators.bm25 import bm25_topk

    docs = io.table(spark, SF_DIR, "documents")
    plan = _plan(bm25_topk(docs, ["data", "fast"], 10))
    assert "CartesianProduct" not in plan
