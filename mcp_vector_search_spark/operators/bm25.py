"""BM25 keyword search as pure SQL aggregation (reference A2/T2,
``bm25_backend.py:84-375``).

The reference keeps a pickled in-memory BM25Okapi corpus; here the
"index" is three DataFrames — exactly the decomposition that scales:

- ``postings(doc_id, term, tf)``   — one shuffle to build (groupBy),
  partitioned by term for query-time pruning;
- ``doc_stats(doc_id, dl)`` + corpus aggregates (N, avgdl);
- ``term_stats(term, df, idf)``    — build-time idf table (tiny:
  one row per distinct term).

Query time touches only the postings of the query's terms (an `isin`
filter that prunes before the join), so cost is O(df(q)) not O(corpus)
— the property that survives 100 TB.

Scoring: Okapi BM25 exactly as ``rank_bm25.BM25Okapi`` (the class the
reference instantiates, ``bm25_backend.py:30-145``):

    idf_raw(t) = ln((N - df + 0.5) / (df + 0.5))
    idf(t)     = idf_raw(t)                  if idf_raw(t) >= 0
                 epsilon * avg(idf_raw)      otherwise   (epsilon=0.25,
                 average over ALL corpus terms, incl. negatives)
    s(d,q)     = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

k1=1.5, b=0.75 are BM25Okapi's constructor defaults; the reference does
not override them. (Round 1 shipped the Lucene idf variant
ln(1+(N-df+0.5)/(df+0.5)) with k1=1.2 — fixed per ADVICE r1 for
reference parity.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.text import tokenize

K1 = 1.5
B = 0.75
EPSILON = 0.25


def build_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """postings(doc_id, term, tf). One explode + one groupBy; map-side
    partial aggregation (partial_count) halves the shuffle."""
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("term"))
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def build_doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_stats(doc_id, dl) — document length in tokens; no shuffle
    (per-row expression). Includes token-less docs with dl=0 (exact
    BM25Okapi corpus semantics); the fast path below derives the same
    stats from postings instead."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(text_col)).cast("double").alias("dl"),
    )


def doc_stats_from_postings(postings: DataFrame) -> DataFrame:
    """doc_stats derived from postings (dl = Σ tf) — skips a second
    tokenize pass over the corpus; the postings shuffle is far cheaper
    than re-tokenizing 100 TB of text. Token-less docs are absent
    (they're absent from postings), which only shifts N/avgdl when a
    corpus actually contains empty docs — document or fall back to
    `build_doc_stats` there."""
    return postings.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))


def build_term_stats(
    postings: DataFrame, doc_stats: DataFrame, epsilon: float = EPSILON
) -> DataFrame:
    """term_stats(term, df, idf) with BM25Okapi's epsilon-floored idf.

    Build-time: one groupBy(term) over postings plus one global average
    over the (small) term table. The flooring constant eps·avg(idf_raw)
    is a corpus scalar — broadcast, never reshuffled. Persist this
    (partitioned/sorted by term) as the K3 index sink.
    """
    n_docs = doc_stats.agg(F.count("*").cast("double").alias("n_docs"))
    df_t = (
        postings.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("double").alias("df"))
        .join(F.broadcast(n_docs))
        .withColumn(
            "idf_raw", F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
    )
    avg_idf = df_t.agg(F.avg("idf_raw").alias("avg_idf"))
    return (
        df_t.join(F.broadcast(avg_idf))
        .withColumn(
            "idf",
            F.when(F.col("idf_raw") < 0, F.lit(epsilon) * F.col("avg_idf")).otherwise(
                F.col("idf_raw")
            ),
        )
        .select("term", "df", "idf")
    )


def bm25_scores(
    postings: DataFrame,
    doc_stats: DataFrame,
    query_terms: list[str],
    term_stats: DataFrame | None = None,
    k1: float = K1,
    b: float = B,
    round_to: int | None = 6,
) -> DataFrame:
    """Score every doc containing ≥1 query term → (doc_id, score).

    Plan shape: postings pruned by `term isin(query)` (pushed to the
    scan when postings are stored partitioned by term), tiny
    term_stats/avgdl aggregates broadcast back, one groupBy(doc_id) to
    sum term contributions.
    """
    q = list(dict.fromkeys(query_terms))  # dedupe, keep order
    if term_stats is None:
        term_stats = build_term_stats(postings, doc_stats)
    qp = postings.filter(F.col("term").isin(q))
    q_stats = term_stats.filter(F.col("term").isin(q))

    avg = doc_stats.agg(F.avg("dl").alias("avgdl"))

    scored = (
        qp.join(doc_stats, "doc_id")
        .join(F.broadcast(q_stats), "term")
        .join(F.broadcast(avg))
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    agg = scored.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
    if round_to is not None:
        agg = agg.withColumn("score", F.round("score", round_to))
    return agg


def write_bm25_index(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """K3 index sink (reference pickles BM25Okapi,
    ``bm25_backend.py:202-267``; here the index is three parquet
    tables). postings is sorted by term within files so query-time
    `term IN (...)` filters benefit from parquet min/max pruning —
    at 100 TB, store it partitioned/Z-ordered by a term-hash bucket.
    """
    postings = build_postings(docs, id_col, text_col)
    doc_stats = doc_stats_from_postings(postings)
    term_stats = build_term_stats(postings, doc_stats)
    postings.sortWithinPartitions("term").write.mode("overwrite").parquet(f"{path}/postings")
    doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")


def read_bm25_index(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/doc_stats"),
        spark.read.parquet(f"{path}/term_stats"),
    )


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int,
) -> DataFrame:
    """Query path against a persisted index: touches only the postings
    of the query's terms (In-filter pushed to the parquet scan) — the
    O(df(q)) cost the reference gets from its in-memory BM25 object,
    but without loading the corpus."""
    postings, doc_stats, term_stats = read_bm25_index(spark, path)
    return (
        bm25_scores(postings, doc_stats, query_terms, term_stats=term_stats)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """End-to-end BM25 top-k over a raw document table.

    `min_score=0.0` reproduces the reference's zero-score filter (P5,
    ``bm25_backend.py:187`` keeps only score > 0); default keeps every
    doc matching ≥1 query term, BM25Okapi-style.

    With `cache_index` (default) the postings/doc-stats/idf frames are
    cached: the scoring plan references postings from three branches,
    and without a materialization each branch re-tokenizes the corpus
    — three full passes, the scale-killer flagged in round 2 (measured
    at sf0.1: 6.5 s → 4.9 s cold, ~1.0 s warm). Spark's CacheManager
    dedupes by canonicalized plan, so repeated calls over the same
    docs frame (hybrid legs, expanded variants) share ONE cached
    build. (A localCheckpoint here measured worse — it destroys the
    query-term pruning on the scoring branch.) The persisted-index
    path (`write_bm25_index` / `bm25_topk_indexed`) remains the K3
    production path for a standing corpus.
    """
    postings = build_postings(docs, id_col, text_col)
    if cache_index:
        postings = postings.cache()
    stats = doc_stats_from_postings(postings)
    term_stats = build_term_stats(postings, stats)
    if cache_index:
        stats = stats.cache()
        term_stats = term_stats.cache()
    scored = bm25_scores(postings, stats, query_terms, term_stats=term_stats)
    if min_score is not None:
        scored = scored.filter(F.col("score") > min_score)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
