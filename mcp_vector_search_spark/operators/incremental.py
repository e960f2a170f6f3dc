"""Incremental-indexing joins (reference J6/J7/J8,
``core/indexer.py:578-639``, ``core/file_move_detector.py``,
``vectors_backend.py:1355-1397``).

All three are single equi-joins whose keys are ids/fingerprints — the
cheapest shuffles possible (no payload columns move). At 100 TB the
anti-joins prune the *entire* unchanged corpus before any expensive
stage (parse, embed) runs: this is the operator family that makes
re-indexing O(delta) instead of O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changed_or_new(
    current: DataFrame,
    indexed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "fingerprint",
) -> DataFrame:
    """Rows in `current` whose (id, content-hash) is not in `indexed`
    — the re-parse/re-embed work queue (reference J6,
    ``indexer.py:620-639``). Left-anti on the composite key."""
    return current.join(
        indexed.select(id_col, hash_col), [id_col, hash_col], "left_anti"
    )


def unembedded(
    chunks: DataFrame,
    vectors: DataFrame,
    chunk_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Chunks with no vector yet — the embedding work queue (reference
    J8, ``vectors_backend.py:1355-1397``). The reference reads the full
    chunk_id column from both tables and set-diffs in Python; here the
    anti-join ships only the id column (Catalyst prunes the rest)."""
    return chunks.join(
        vectors.select(F.col(vec_id_col).alias(chunk_id_col)), chunk_id_col, "left_anti"
    )


def moved(
    new_docs: DataFrame,
    indexed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "fingerprint",
) -> DataFrame:
    """Content present under a new id/path — metadata UPDATE instead of
    re-embed (reference J7, ``file_move_detector.py``, applied
    ``indexer.py:594-618``). Inner join on the content hash with an
    id-inequality predicate → (old_id, new_id, fingerprint)."""
    old = indexed.select(F.col(id_col).alias("old_id"), F.col(hash_col).alias(hash_col))
    new = new_docs.select(F.col(id_col).alias("new_id"), F.col(hash_col).alias(hash_col))
    return (
        new.join(old, hash_col)
        .filter(F.col("new_id") != F.col("old_id"))
        .select("old_id", "new_id", hash_col)
    )
