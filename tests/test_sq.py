"""Scalar quantization (operators/sq.py) — the reference's IVF_SQ codec."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mcp_vector_search_spark import io
from mcp_vector_search_spark.operators.sq import (
    sq_encode,
    sq_topk,
    sq_topk_refined,
    sq_train,
)
from mcp_vector_search_spark.operators.topk import topk_per_query_np

SF_DIR = "/root/testdata/sf0.01"
K = 10


def _queries(emb, n=16):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_sq_roundtrip_error_bounded(spark):
    """Decode error per dim is ≤ step/2 = (mx−mn)/510 of the unit
    corpus — the defining property of 8-bit affine quantization."""
    emb = io.table(spark, SF_DIR, "embeddings")
    bounds = sq_train(emb)
    b = {r["dim"]: (r["mn"], r["mx"]) for r in bounds.collect()}
    codes = sq_encode(emb, bounds)
    joined = (
        emb.join(codes, "vec_id")
        .select("vec_id", "embedding", "codes")
        .limit(50)
        .collect()
    )
    for r in joined:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v /= np.linalg.norm(v)
        for d, code in enumerate(r["codes"]):
            mn, mx = b[d]
            recon = mn + code * ((mx - mn) / 255.0)
            assert abs(recon - v[d]) <= (mx - mn) / 510 + 1e-12


def test_sq_topk_recall_in_reference_band(spark):
    emb = io.table(spark, SF_DIR, "embeddings")
    bounds = sq_train(emb)
    codes = sq_encode(emb, bounds)
    q = _queries(emb)
    truth = {(r.query_id, r.vec_id) for r in topk_per_query_np(emb, q, K).collect()}
    approx = {(r.query_id, r.vec_id) for r in sq_topk(codes, bounds, q, K).collect()}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.975, f"SQ recall@10 = {recall}"


def test_sq_refined_matches_exact_topk(spark):
    """refine_factor=5 exact rerank (the reference's IVF_SQ query
    shape) recovers the exact top-k even where raw SQ scores disagree."""
    emb = io.table(spark, SF_DIR, "embeddings")
    bounds = sq_train(emb)
    codes = sq_encode(emb, bounds)
    q = _queries(emb, 8)
    truth = {(r.query_id, r.vec_id) for r in topk_per_query_np(emb, q, K).collect()}
    refined = {
        (r.query_id, r.vec_id)
        for r in sq_topk_refined(emb, codes, bounds, q, K).collect()
    }
    assert truth == refined


def test_sq_degenerate_dim_codes_to_zero(spark):
    rows = [(i, [float(i), 1.0]) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # dim 1 is constant AFTER normalization? no — normalize varies both;
    # use normalize=False to pin dim 1 exactly constant
    bounds = sq_train(df, normalize=False)
    codes = {r["vec_id"]: r["codes"] for r in sq_encode(df, bounds, normalize=False).collect()}
    assert all(c[1] == 0 for c in codes.values())  # degenerate dim → 0
    assert codes[1][0] == 0 and codes[4][0] == 255  # bounds map to extremes


def test_sq_string_ids(spark):
    emb = (
        io.table(spark, SF_DIR, "embeddings")
        .limit(100)
        .select(F.concat(F.lit("v-"), F.col("vec_id")).alias("vec_id"), "embedding")
    )
    bounds = sq_train(emb)
    codes = sq_encode(emb, bounds)
    assert dict(codes.dtypes)["vec_id"] == "string"
    q = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sq_topk(codes, bounds, q, 5)
    assert out.count() == 10
    assert dict(out.dtypes)["query_id"] == "string"


def test_sq_packed_codes_parity(spark):
    """`sq_pack` + `sq_topk_packed` return BIT-IDENTICAL rows to the
    per-row SQ scan (r5: layout change, never an answer change), and
    the refined path accepts the packed layout."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark import io
    from mcp_vector_search_spark.operators.sq import (
        sq_encode,
        sq_pack,
        sq_topk,
        sq_topk_packed,
        sq_topk_refined,
        sq_train,
    )

    emb = io.table(spark, SF_DIR, "embeddings")
    bounds = sq_train(emb)
    codes = sq_encode(emb, bounds).cache()
    packed = sq_pack(codes, n_buckets=8).cache()
    rows = packed.collect()
    assert sum(r.n for r in rows) == emb.count()
    ids = [v for r in rows for v in r.vec_ids]
    assert len(ids) == len(set(ids)) == emb.count()

    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, sq_topk(codes, bounds, queries, 10).collect()))
    b = sorted(map(tuple, sq_topk_packed(packed, bounds, queries, 10).collect()))
    assert a == b

    r1 = sorted(map(tuple, sq_topk_refined(emb, codes, bounds, queries, 10).collect()))
    r2 = sorted(
        map(tuple, sq_topk_refined(
            emb, codes, bounds, queries, 10, packed_codes=packed
        ).collect())
    )
    assert r1 == r2
    codes.unpersist()
    packed.unpersist()


def test_sq_pack_fused_bit_identical_to_staged(spark):
    """r7: the fused one-pass SQ encode+pack must produce the exact
    block layout of sq_pack(sq_encode(...)) — same JVM bucket hash,
    same encode kernel, same uint8 truncation — and serve identically."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark import io
    from mcp_vector_search_spark.operators.sq import (
        sq_encode,
        sq_pack,
        sq_pack_fused,
        sq_topk_packed,
        sq_train,
    )

    emb = io.table(spark, "/root/testdata/sf0.01", "embeddings")
    bounds = sq_train(emb)
    bounds = spark.createDataFrame(bounds.collect(), bounds.schema)
    staged = sq_pack(sq_encode(emb, bounds))
    fused = sq_pack_fused(emb, bounds)

    def key(df):
        return sorted(
            (r.bucket, r.block_id, r.n, r.d, tuple(r.vec_ids), r.codes)
            for r in df.collect()
        )

    want = key(staged)
    assert key(fused) == want
    # forced multi-block split parity + non-default bucket count
    assert key(sq_pack(sq_encode(emb, bounds), n_buckets=8, rows_per_block=32)) == key(
        sq_pack_fused(emb, bounds, n_buckets=8, rows_per_block=32)
    )
    # serving parity
    queries = emb.filter(F.col("vec_id") % 23 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, sq_topk_packed(staged, bounds, queries, 5).collect()))
    b = sorted(map(tuple, sq_topk_packed(fused, bounds, queries, 5).collect()))
    assert a == b
