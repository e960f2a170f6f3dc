"""BM25 keyword search as pure SQL aggregation (reference A2/T2,
``bm25_backend.py:84-375``).

The reference keeps a pickled in-memory BM25Okapi corpus; here the
"index" is two DataFrames — exactly the decomposition that scales:

- ``postings(doc_id, term, tf)``   — one shuffle to build (groupBy),
  partitioned by term for query-time pruning;
- ``doc_stats(doc_id, dl)`` + corpus aggregates (N, avgdl).

Query time touches only the postings of the query's terms (an `isin`
filter that prunes before the join), so cost is O(df(q)) not O(corpus)
— the property that survives 100 TB.

Scoring: Okapi BM25 with the Lucene idf variant
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d,q)  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
k1=1.2, b=0.75 (the BM25Okapi defaults the reference uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.text import tokenize

K1 = 1.2
B = 0.75


def build_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """postings(doc_id, term, tf). One explode + one groupBy; map-side
    partial aggregation (partial_count) halves the shuffle."""
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("term"))
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def build_doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_stats(doc_id, dl) — document length in tokens; no shuffle
    (per-row expression)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(text_col)).cast("double").alias("dl"),
    )


def bm25_scores(
    postings: DataFrame,
    doc_stats: DataFrame,
    query_terms: list[str],
    k1: float = K1,
    b: float = B,
    round_to: int | None = 6,
) -> DataFrame:
    """Score every doc containing ≥1 query term → (doc_id, score).

    Plan shape: postings pruned by `term isin(query)` (pushed to the
    scan when postings are stored partitioned by term), tiny
    df/N/avgdl aggregates broadcast back, one groupBy(doc_id) to sum
    term contributions.
    """
    q = list(dict.fromkeys(query_terms))  # dedupe, keep order
    qp = postings.filter(F.col("term").isin(q))

    n_avg = doc_stats.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = qp.groupBy("term").agg(F.countDistinct("doc_id").cast("double").alias("df"))

    scored = (
        qp.join(doc_stats, "doc_id")
        .join(F.broadcast(df_t), "term")
        .join(F.broadcast(n_avg))
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end BM25 top-k over a raw document table (builds the
    postings inline; production path persists them — K3)."""
    postings = build_postings(docs, id_col, text_col)
    stats = build_doc_stats(docs, id_col, text_col)
    return (
        bm25_scores(postings, stats, query_terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
