"""IVF ANN: recall@10 vs the brute-force path must land in the
reference's 97.5–100% band (BASELINE.md, CHANGELOG.md:429-431)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_vector_search_spark import io
from mcp_vector_search_spark.operators.ivf import ivf_build, ivf_topk_batch
from mcp_vector_search_spark.operators.topk import topk_per_query

SF_DIR = "/root/testdata/sf0.01"
N_QUERIES = 25
K = 10


def test_ivf_recall_at_10(spark):
    """nprobes=14 of 16 clusters: real pruning (12% of the corpus
    skipped per query) while recall stays in the reference band. The
    synthetic embeddings are only weakly clustered — worst case for
    IVF — so coverage must stay high at this tiny N; at reference
    scale (74K chunks, 272 clusters) structured embeddings allow
    nprobes=20/272. Below ANN_ACTIVATION_MIN_ROWS=4096 the reference
    brute-forces anyway."""
    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build(emb, num_clusters=16)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    truth = topk_per_query(emb, queries, K)
    approx = ivf_topk_batch(assigned, centroids, queries, K, nprobes=14)

    t = {(r.query_id, r.vec_id) for r in truth.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.975, f"recall@10 = {recall}"


def test_ivf_build_deterministic_and_complete(spark):
    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build(emb, num_clusters=16)
    assert assigned.count() == emb.count()  # every vector assigned
    assert centroids.count() == 16
    # fixed seed → same assignment on rebuild
    assigned2, _ = ivf_build(emb, num_clusters=16)
    diff = (
        assigned.select("vec_id", "cluster_id")
        .exceptAll(assigned2.select("vec_id", "cluster_id"))
        .count()
    )
    assert diff == 0


def test_ivf_build_sampled_contract_and_recall(spark):
    """The sample-fit build honors the ivf_build contract (unit column,
    complete assignment, deterministic) and its trained index keeps
    recall in the reference band via the np scoring kernel."""
    from mcp_vector_search_spark.operators.ivf import ivf_build_sampled, ivf_topk_batch_np
    from mcp_vector_search_spark.operators.topk import topk_per_query_np

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build_sampled(emb, num_clusters=16, sample_rows=256)
    assert centroids.count() == 16
    assert assigned.count() == emb.count()
    assert {"unit", "cluster_id"} <= set(assigned.columns)
    # deterministic rebuild
    a2, _ = ivf_build_sampled(emb, num_clusters=16, sample_rows=256)
    assert (
        assigned.select("vec_id", "cluster_id")
        .exceptAll(a2.select("vec_id", "cluster_id"))
        .count()
        == 0
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = topk_per_query_np(emb, queries, K)
    approx = ivf_topk_batch_np(assigned, centroids, queries, K, nprobes=14)
    t = {(r.query_id, r.vec_id) for r in truth.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.975, f"recall@10 = {recall}"
