"""Arrow-vectorized top-k kernels must be bit-identical (at round-6)
to the interpreted HOF paths they accelerate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _emb(spark):
    from mcp_vector_search_spark import io

    return io.table(spark, SF_DIR, "embeddings")


def _queries(spark, n=8):
    emb = _emb(spark)
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_topk_np_matches_hof(spark):
    from mcp_vector_search_spark.operators.topk import (
        topk_per_query,
        topk_per_query_np,
    )

    emb, q = _emb(spark), _queries(spark)
    a = {(r.query_id, r.vec_id, r.cos_sim, r.rn) for r in topk_per_query(emb, q, 5).collect()}
    b = {(r.query_id, r.vec_id, r.cos_sim, r.rn) for r in topk_per_query_np(emb, q, 5).collect()}
    assert a == b
    assert len(a) == 8 * 5


def test_ivf_np_matches_hof(spark):
    from mcp_vector_search_spark.operators.ivf import (
        ivf_build,
        ivf_topk_batch,
        ivf_topk_batch_np,
    )

    emb, q = _emb(spark), _queries(spark)
    assigned, centroids = ivf_build(emb, num_clusters=8)
    a = {
        (r.query_id, r.vec_id, r.cos_sim, r.rn)
        for r in ivf_topk_batch(assigned, centroids, q, 5, nprobes=3).collect()
    }
    b = {
        (r.query_id, r.vec_id, r.cos_sim, r.rn)
        for r in ivf_topk_batch_np(assigned, centroids, q, 5, nprobes=3).collect()
    }
    assert a == b
    assert len(a) == 8 * 5


def test_np_kernel_zero_vector_parity(spark):
    """A zero-norm corpus vector must rank LAST (cos 0), not first
    (NaN), in the vectorized path — same as unit_expr's semantics."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.operators.topk import (
        topk_per_query,
        topk_per_query_np,
    )

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    a = [(r.vec_id, r.cos_sim, r.rn) for r in topk_per_query(vecs, q, 4).orderBy("rn").collect()]
    b = [(r.vec_id, r.cos_sim, r.rn) for r in topk_per_query_np(vecs, q, 4).orderBy("rn").collect()]
    assert a == b
    assert a[-1][0] == 2 and a[-1][1] == 0.0  # zero vector last, score 0
