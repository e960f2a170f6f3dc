from __future__ import annotations

from pyspark.sql import functions as F

from mcp_vector_search_spark.operators.fusion import max_score_merge, rrf_fuse
from mcp_vector_search_spark.operators.topk import (
    knn_brute_force,
    rank_by,
    topk_per_query,
)


def _vectors(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 1.0]),
        (3, [-1.0, 0.0]),
        (4, [1.0, 0.0]),  # ties with 0 — id tiebreak
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_brute_force_order_and_tiebreak(spark):
    v = _vectors(spark)
    q = spark.createDataFrame([([1.0, 0.0],)], "query_vec array<float>")
    got = [(r.vec_id, r.cos_sim) for r in knn_brute_force(v, q, 4).collect()]
    assert got[0] == (0, 1.0) and got[1] == (4, 1.0)  # tie → lower id first
    assert got[2][0] == 2 and abs(got[2][1] - 0.707107) < 1e-6
    assert got[3] == (1, 0.0)


def test_topk_per_query(spark):
    v = _vectors(spark)
    q = v.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_per_query(v, q, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rn, r.vec_id))
    assert sorted(by_q[0]) == [(1, 0), (2, 4)]
    assert sorted(by_q[1])[0] == (1, 1)


def test_rrf_fuse_exact_values(spark):
    a = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (12, 2)], "doc_id long, rank int")
    got = {r.doc_id: r.rrf_score for r in rrf_fuse(a, b, alpha=0.5, round_to=6).collect()}
    raw = {
        10: 0.5 / 61,            # rank 1 in a only
        11: 0.5 / 62 + 0.5 / 61,  # rank 2 in a, rank 1 in b
        12: 0.5 / 62,            # rank 2 in b only
    }
    m = max(raw.values())
    assert got == {k: round(v / m, 6) for k, v in raw.items()}


def test_max_score_merge(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (1, 0.9), (2, 0.3)], "doc_id long, score double"
    )
    got = {r.doc_id: r.score for r in max_score_merge(df, "doc_id", "score").collect()}
    assert got == {1: 0.9, 2: 0.3}


def test_rank_by_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.5), (3, 0.9)], "doc_id long, score double"
    )
    got = {r.doc_id: r.rank for r in rank_by(df, "score", "doc_id").collect()}
    assert got == {3: 1, 1: 2, 2: 3}
