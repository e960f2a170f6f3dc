"""Smell detection + directory rollups (reference A5/A9,
``analysis/collectors/smells.py:73-400`` threshold predicates,
``core/directory_index.py`` rollups).

Smells are threshold predicates evaluated as one projection, emitted
as exploded (id, smell, severity) rows — the reference's per-chunk
Python collectors become a single codegen'd pass. Directory rollups
explode each path's ancestor prefixes and aggregate once per level —
the groupBy key is (dir), so the shuffle is proportional to distinct
directories, not files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_vector_search_spark.functions.text import (
    distinct_token_ratio,
    punct_ratio,
    tokenize,
)

# Thresholds (reference keys thresholds in config/thresholds.py; these
# are the prose-corpus analogs of long-method / god-class / deep-nesting)
LONG_DOC_CHARS = 400
LOW_DIVERSITY_RATIO = 0.5
HIGH_PUNCT_RATIO = 0.1


def detect_smells(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, smell, severity) — one row per triggered smell."""
    toks = tokenize(text_col)
    # use the precomputed n_chars when the frame carries one (the
    # corpus tables do — and their oracle SQL compares against it);
    # fall back to length(text) so frames with only (id, text) work
    # instead of hitting UNRESOLVED_COLUMN (r6 review #4)
    n_chars = F.col("n_chars") if "n_chars" in docs.columns else F.length(text_col)
    checks = F.array(
        F.when(
            n_chars > LONG_DOC_CHARS,
            F.struct(F.lit("long_doc").alias("smell"), F.lit("warning").alias("severity")),
        ),
        F.when(
            (F.size(toks) > 0) & (distinct_token_ratio(toks) < LOW_DIVERSITY_RATIO),
            F.struct(F.lit("low_diversity").alias("smell"), F.lit("info").alias("severity")),
        ),
        F.when(
            punct_ratio(text_col) > HIGH_PUNCT_RATIO,
            F.struct(F.lit("high_punct").alias("smell"), F.lit("warning").alias("severity")),
        ),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.filter(checks, lambda c: c.isNotNull())).alias("s"),
        )
        .select("doc_id", "s.smell", "s.severity")
    )


def directory_rollup(
    files: DataFrame, path_col: str = "path", size_col: str = "n_chars"
) -> DataFrame:
    """(dir, n_files, total_chars) — every ancestor directory of each
    path gets the file rolled into it (reference's recursive totals,
    ``core/models.py:589-647``). Ancestors are built row-locally with
    `transform` over the split path; one explode + one groupBy."""
    parts = F.split(F.col(path_col), "/")
    # sequence(1, 0) yields a DESCENDING [1, 0] (Spark sequences count
    # down when stop < start), so a root-level path emitted itself and
    # an empty-string row as fake directories; DuckDB's range(1, 1) —
    # the oracle's formulation — is empty, the correct semantics
    # (r6 review #4)
    ancestors = F.when(
        F.size(parts) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(parts) - 1),
            lambda i: F.array_join(F.slice(parts, 1, i), "/"),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        files.select(F.explode(ancestors).alias("dir"), F.col(size_col))
        .groupBy("dir")
        .agg(F.count("*").alias("n_files"), F.sum(size_col).alias("total_chars"))
    )
