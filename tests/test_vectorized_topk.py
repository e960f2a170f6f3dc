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


def test_np_kernels_string_ids(spark):
    """The Arrow kernels must accept non-long id columns (the project's
    own 16-hex chunk_id strings) — output schemas derive from inputs."""
    from mcp_vector_search_spark.operators.ivf import ivf_topk_batch_np
    from mcp_vector_search_spark.operators.mmr import mmr_diversify
    from mcp_vector_search_spark.operators.topk import topk_per_query_np

    rows = [
        ("a1b2", [1.0, 0.0]),
        ("c3d4", [0.9, 0.1]),
        ("e5f6", [0.0, 1.0]),
        ("0789", [0.5, 0.5]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = spark.createDataFrame(
        [("q-0", [1.0, 0.0])], "query_id string, query_vec array<double>"
    )
    got = topk_per_query_np(vecs, q, 2).orderBy("rn").collect()
    assert [(r.query_id, r.vec_id) for r in got] == [("q-0", "a1b2"), ("q-0", "c3d4")]

    # IVF variant: trivially cluster everything into one bucket
    from pyspark.sql import functions as F

    assigned = vecs.withColumn("cluster_id", F.lit(0))
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cluster_id long, centroid array<double>"
    )
    got_ivf = ivf_topk_batch_np(assigned, centroids, q, 2, nprobes=1).orderBy("rn").collect()
    assert [(r.query_id, r.vec_id) for r in got_ivf] == [
        ("q-0", "a1b2"),
        ("q-0", "c3d4"),
    ]

    cand = vecs.withColumn("cos_sim", F.get("embedding", 0))
    got_mmr = mmr_diversify(cand, k=2, diversity=0.3, id_col="vec_id", score_col="cos_sim")
    assert {r.vec_id for r in got_mmr.collect()} <= {"a1b2", "c3d4", "e5f6", "0789"}
    assert got_mmr.count() == 2
