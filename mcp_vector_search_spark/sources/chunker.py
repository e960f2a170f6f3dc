"""Fallback chunker (reference S3, ``parsers/base.py:301-386``): fixed
windows over a document, emitted as chunk rows with deterministic ids.

The reference windows over *lines* (DEFAULT_CHUNK_SIZE=50); the test
corpus is single-line prose, so the unit here is tokens — same
operator shape (fixed non-overlapping windows + composite chunk id),
different split expression. Both stay entirely row-local: the windows
for one document are built with `transform` over a `sequence` of
window indices and `slice`, then exploded — zero shuffle, perfectly
parallel over any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.hashing import chunk_id_expr
from mcp_vector_search_spark.functions.text import tokenize

DEFAULT_CHUNK_SIZE = 50


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
    path_col: str = "source",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_id, chunk_text, n_tokens).

    Non-overlapping `chunk_size`-token windows; empty docs emit no
    chunks (reference skips empty files). chunk_id is the composite
    sha256 of (path, type, name, start, end, content) — F7.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(path_col).alias("_path"),
        tokenize(text_col).alias("_toks"),
    )
    n_chunks = F.ceil(F.size("_toks") / F.lit(chunk_size)).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice("_toks", i * chunk_size + 1, chunk_size), " ").alias(
                "chunk_text"
            ),
            F.least(F.size("_toks") - i * chunk_size, F.lit(chunk_size)).alias("n_tokens"),
        ),
    )
    exploded = (
        toks.filter(F.size("_toks") > 0)
        .select("doc_id", "_path", F.explode(windows).alias("w"))
        .select("doc_id", "_path", "w.chunk_idx", "w.chunk_text", "w.n_tokens")
    )
    start = F.col("chunk_idx") * chunk_size
    return exploded.select(
        "doc_id",
        "chunk_idx",
        chunk_id_expr(
            F.col("_path"),
            F.lit("text"),
            F.lit(None).cast("string"),
            start,
            start + F.col("n_tokens"),
            F.col("chunk_text"),
        ).alias("chunk_id"),
        "chunk_text",
        "n_tokens",
    )
