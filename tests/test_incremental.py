from __future__ import annotations

from mcp_vector_search_spark.operators.incremental import changed_or_new, moved, unembedded


def test_changed_or_new(spark):
    current = spark.createDataFrame(
        [(1, "h1"), (2, "h2-new"), (3, "h3")], "doc_id long, fingerprint string"
    )
    indexed = spark.createDataFrame(
        [(1, "h1"), (2, "h2-old")], "doc_id long, fingerprint string"
    )
    got = sorted(r.doc_id for r in changed_or_new(current, indexed).collect())
    assert got == [2, 3]  # 2 changed, 3 new, 1 unchanged


def test_unembedded(spark):
    chunks = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    vectors = spark.createDataFrame([(1,), (3,)], "vec_id long")
    got = sorted(r.doc_id for r in unembedded(chunks, vectors).collect())
    assert got == [2]


def test_moved(spark):
    indexed = spark.createDataFrame(
        [(1, "hA"), (2, "hB")], "doc_id long, fingerprint string"
    )
    new = spark.createDataFrame([(99, "hA")], "doc_id long, fingerprint string")
    got = [(r.old_id, r.new_id) for r in moved(new, indexed).collect()]
    assert got == [(1, 99)]
