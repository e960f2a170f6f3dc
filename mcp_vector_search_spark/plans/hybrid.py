"""Hybrid search: BM25 leg ⊕ vector leg → RRF fusion → top-k.

Re-expresses the reference's main search pipeline
(``core/search.py:215-432``, hybrid mode ``:1656-1768``) as ONE
DataFrame program. The reference runs the two legs sequentially in
Python and fuses in-memory; here both legs are branches of a single
logical plan — Catalyst sees the whole tree, and the only shuffles are
the two leg-internal aggregations (BM25 groupBy, top-k rank) plus one
tiny fused join.

Scale shape: each leg ends in an over-retrieval `limit` (reference
retrieves `limit*2` per leg, ``search.py:293-295``) so the fusion
stage is O(k), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_vector_search_spark.operators.bm25 import bm25_topk
from mcp_vector_search_spark.operators.fusion import rrf_fuse
from mcp_vector_search_spark.operators.topk import knn_brute_force, rank_by


def hybrid_search(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query: DataFrame,
    k: int = 10,
    over_retrieve: int = 2,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    bm25_cache_index: bool = False,
    bm25_stats: dict | None = None,
) -> DataFrame:
    """(doc_id, rrf_score) — top-k fused results.

    `query` is a 1-row (query_vec) DataFrame; `docs[id_col]` and
    `vectors[vec_id_col]` share an id universe (the reference's
    denormalized vectors table guarantees this by construction).
    `bm25_stats` (from `bm25_oneshot_stats` over the UNION of variant
    terms) lets multi-variant callers pay the corpus stats scan once.
    """
    n_leg = k * over_retrieve

    bm_leg = rank_by(
        bm25_topk(
            docs,
            query_terms,
            n_leg,
            id_col=id_col,
            text_col=text_col,
            cache_index=bm25_cache_index,
            stats=bm25_stats,
        ),
        "score",
        "doc_id",
    )
    vec_leg = rank_by(
        knn_brute_force(vectors, query, n_leg, vec_col=vec_col, id_col=vec_id_col)
        .withColumnRenamed(vec_id_col, "doc_id")
        .select("doc_id", "cos_sim"),
        "cos_sim",
        "doc_id",
    )
    fused = rrf_fuse(vec_leg, bm_leg, id_col="doc_id", alpha=alpha)
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)
