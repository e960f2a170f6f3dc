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
from mcp_vector_search_spark.operators.fusion import RRF_K as RRF_K_BATCH
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


def hybrid_search_batch(
    docs: DataFrame,
    vectors: DataFrame,
    term_sets: list[tuple[int, list[str]]],
    query_vecs: DataFrame,
    k: int = 10,
    over_retrieve: int = 2,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    query_id_col: str = "query_id",
    stats: dict | None = None,
) -> DataFrame:
    """A query SET through the full hybrid pipeline as ONE DataFrame
    program → (query_id, doc_id, rrf_score, rn) — the engine's serving
    thesis (VERDICT r4 #6): per-query hybrid latency amortizes to
    batch throughput, because every query shares both corpus scans.

    `term_sets` = [(query_id, terms)], `query_vecs` = (query_id,
    query_vec); ids must align. Per query the semantics are EXACTLY
    `hybrid_search`: one-shot BM25 scoring (round-6, zero-score docs
    excluded by the matched filter), round-6 cosine kNN, both legs
    over-retrieved to k*over_retrieve, RRF α/(60+rank) with per-query
    max-normalization, round-6, top-k (ties → lower doc_id).

    Plan shape: ONE stats scan for the UNION of every query's terms
    (`bm25_oneshot_stats` — the same sharing the query-expansion path
    uses), ONE scoring scan computing every query's tf columns, then
    an explode to (query_id, doc_id, score) pairs — sparse: a doc
    reaches query q only if it matches ≥1 of q's terms — into a
    per-query rank window. The vector leg is the Arrow batch kernel
    (`topk_per_query_np`), one corpus scan for all queries. Fusion
    joins two ≤|Q|·n_leg-row sets on (query_id, doc_id): tiny at any
    corpus scale.

    Scale envelope: per-query score expressions are compiled into the
    scan (term_sets is a driver-side list), so the plan width grows
    with |Q|·|terms| — right for serving batches up to a few hundred
    queries per program. Larger sets split into chunks of ~100
    (per-chunk stats reuse via `stats=`), or route the BM25 side
    through the persisted postings index where the query set is a
    TABLE, not a literal.
    """
    from pyspark.sql.window import Window

    from mcp_vector_search_spark.functions.text import tokenize
    from mcp_vector_search_spark.operators.bm25 import (
        B,
        K1,
        bm25_oneshot_stats,
    )
    from mcp_vector_search_spark.operators.topk import topk_per_query_np

    n_leg = k * over_retrieve
    all_terms = list(dict.fromkeys(t for _, ts in term_sets for t in ts))
    if stats is None:
        stats = bm25_oneshot_stats(docs, all_terms, id_col, text_col)
    idf, avgdl = stats["idf"], stats["avgdl"]
    union_terms = [t for t in all_terms if t in idf]

    # --- BM25 legs: one scan, one tf column per union term ----------
    d = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks"))

    def _tf(term: str):
        return F.size(F.filter("toks", lambda x: x == F.lit(term))).cast("double")

    tf_cols = [_tf(t).alias(f"_tf{i}") for i, t in enumerate(union_terms)]
    d = d.select("doc_id", F.size("toks").cast("double").alias("_dl"), *tf_cols)
    tf_of = {t: F.col(f"_tf{i}") for i, t in enumerate(union_terms)}
    norm = K1 * (1 - B + B * F.col("_dl") / F.lit(avgdl or 1.0))
    entries = []
    for qid, ts in term_sets:
        ts = [t for t in dict.fromkeys(ts) if t in idf]
        if not ts or avgdl == 0:
            continue  # absent-everywhere query: empty BM25 leg
        matched = sum((tf_of[t] for t in ts), F.lit(0.0))
        score = sum(
            (
                F.lit(idf[t]) * tf_of[t] * (K1 + 1) / (tf_of[t] + norm)
                for t in ts
            ),
            F.lit(0.0),
        )
        entries.append(
            F.struct(
                F.lit(qid).alias(query_id_col),
                F.round(score, 6).alias("score"),
                matched.alias("_m"),
            )
        )
    bw = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("doc_id"))
    if entries:
        bm_leg = (
            d.select("doc_id", F.explode(F.array(*entries)).alias("e"))
            .select("doc_id", "e.*")
            .filter(F.col("_m") > 0)
            .withColumn("_rank_b", F.row_number().over(bw))
            .filter(F.col("_rank_b") <= n_leg)
            .select(query_id_col, "doc_id", "_rank_b")
        )
    else:
        # inherit the real id types — a corpus with string chunk_ids
        # must not get a hardcoded-long empty frame that poisons the
        # fusion join
        from mcp_vector_search_spark.operators.topk import id_type

        bm_leg = docs.sparkSession.createDataFrame(
            [],
            f"{query_id_col} {id_type(query_vecs, query_id_col)}, "
            f"doc_id {id_type(docs, id_col)}, _rank_b int",
        )

    # --- vector legs: the Arrow batch kernel, one scan --------------
    vec_leg = (
        topk_per_query_np(
            vectors,
            query_vecs,
            n_leg,
            vec_col=vec_col,
            query_id_col=query_id_col,
            id_col=vec_id_col,
        )
        .select(
            query_id_col,
            F.col(vec_id_col).alias("doc_id"),
            F.col("rn").alias("_rank_a"),
        )
    )

    # --- per-query RRF fusion + max-norm -----------------------------
    fused = (
        vec_leg.join(bm_leg, [query_id_col, "doc_id"], "full_outer")
        .withColumn(
            "_raw",
            F.coalesce(F.lit(alpha) / (F.lit(RRF_K_BATCH) + F.col("_rank_a")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0 - alpha) / (F.lit(RRF_K_BATCH) + F.col("_rank_b")), F.lit(0.0)
            ),
        )
    )
    mx = fused.groupBy(query_id_col).agg(F.max("_raw").alias("_mx"))
    fw = Window.partitionBy(query_id_col).orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.join(F.broadcast(mx), query_id_col)
        .withColumn("rrf_score", F.round(F.col("_raw") / F.col("_mx"), 6))
        .withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") <= k)
        .select(query_id_col, "doc_id", "rrf_score", "rn")
    )
