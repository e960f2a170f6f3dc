"""Embedding inference (reference F11, ``core/embeddings.py:426-1051``)
re-expressed for Spark.

Three pieces, mirroring the reference's architecture:

- `fake_embed_expr` — a deterministic pseudo-embedding as a pure
  column expression (SURVEY §5: "seeded-fake-embedding tests (hash
  text → pseudo-vector) so ranking math is still exact"). This is the
  oracle-checkable stand-in for a model.
- `embed_batch` — the REAL inference shape: `mapInPandas` over Arrow
  batches, model loaded once per executor python worker (broadcast
  pattern). Here the "model" is the same deterministic fake (no
  sentence-transformers in this container; swap `_MODEL` for a real
  encoder and nothing else changes).
- `embed_with_cache` — the reference's content-hash embedding cache
  (``embeddings.py:284-404``) as a join-before-infer: cache hits never
  reach the model, misses are inferred and unioned back. At 100 TB
  the cache join is the difference between re-embedding the corpus
  and embedding the delta.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 8


def _fake_dim(text: str, i: int) -> float:
    h = hashlib.md5(f"{text}#emb{i}".encode()).hexdigest()[:8]
    return round(int(h, 16) % 1000 / 999.0, 6)


def fake_embed_expr(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """array<double>[dim] pseudo-embedding — md5-seeded per dimension,
    reproducible in any engine (and in `_fake_dim` above)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.array(
        *[
            F.round(
                (
                    F.conv(
                        F.substring(F.md5(F.concat(col, F.lit(f"#emb{i}"))), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % 1000
                )
                / 999.0,
                6,
            )
            for i in range(dim)
        ]
    )


def load_sentence_transformer(model_name: str):
    """Guarded real-model loader: returns a SentenceTransformer when
    the library (and weights) are available, else None — the swap-in is
    one config value (reference model registry, ``core/embeddings.py:
    108-283``; default all-MiniLM-L6-v2)."""
    try:
        from sentence_transformers import SentenceTransformer

        return SentenceTransformer(model_name)
    except Exception:
        return None


def embed_batch(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    model_name: str | None = None,
) -> DataFrame:
    """(id, embedding) via Arrow-batched mapInPandas — the production
    inference shape. With `model_name` set and sentence-transformers
    importable, each python worker loads the model ONCE and encodes
    Arrow batches; otherwise (this container) the deterministic fake
    runs through the identical plumbing, so values match
    `fake_embed_expr` and stay oracle-checkable."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        model = load_sentence_transformer(model_name) if model_name else None
        for pdf in batches:
            if model is not None:
                vecs = model.encode(
                    pdf[text_col].tolist(), batch_size=64, show_progress_bar=False
                )
                emb = [[float(x) for x in v] for v in vecs]
            else:
                emb = pdf[text_col].map(
                    lambda t: [_fake_dim(t, i) for i in range(dim)]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": emb})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, embedding array<double>"
    )


def embed_with_cache(
    docs: DataFrame,
    cache: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fingerprint",
    dim: int = DEFAULT_DIM,
) -> tuple[DataFrame, DataFrame]:
    """→ (embeddings for all docs, updated cache).

    cache schema: (fingerprint, embedding). Join-before-infer: only
    fingerprints absent from the cache cross the Python boundary.
    """
    from mcp_vector_search_spark.functions.text import doc_fingerprint

    with_fp = docs.withColumn(fp_col, doc_fingerprint(text_col))
    hits = with_fp.join(cache, fp_col).select(id_col, "embedding")
    misses = with_fp.join(cache.select(fp_col), fp_col, "left_anti")
    inferred = embed_batch(misses, id_col, text_col, dim)
    new_entries = (
        misses.select(id_col, fp_col)
        .join(inferred, id_col)
        .select(fp_col, "embedding")
        .dropDuplicates([fp_col])
    )
    return hits.unionByName(inferred), cache.unionByName(new_entries)
