"""Bucketed co-located join: the write-once-shuffle-never layout.

Asserts the physical plan property the 100 TB design depends on: two
tables bucketed on the same key join with ZERO Exchange operators —
the shuffle happened at write time.
"""

from __future__ import annotations

import uuid

import pytest


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_shuffle(spark, tmp_path, no_broadcast):
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.io import write_bucketed

    left = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("x")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 31).alias("y")
    )
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"bl_{suffix}", f"br_{suffix}"
    try:
        write_bucketed(left, lt, ["doc_id"], num_buckets=8, sort_cols=["doc_id"])
        write_bucketed(right, rt, ["doc_id"], num_buckets=8, sort_cols=["doc_id"])
        joined = spark.table(lt).join(spark.table(rt), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_agg_no_shuffle(spark, tmp_path, no_broadcast):
    """groupBy on the bucket key also reuses the layout — no exchange
    before the final aggregate."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.io import write_bucketed

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("v")
    )
    t = f"ba_{uuid.uuid4().hex[:8]}"
    try:
        write_bucketed(df, t, ["doc_id"], num_buckets=8)
        agg = spark.table(t).groupBy("doc_id").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 10_000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
