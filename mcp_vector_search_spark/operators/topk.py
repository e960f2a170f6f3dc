"""Vector top-k search operators (reference J1/T1,
``vectors_backend.py:733-876``).

Two physical strategies, same logical semantics:

- `knn_brute_force` — exact cosine scan + TakeOrderedAndProject. The
  scan is embarrassingly parallel; per-partition top-k is combined on
  the driver (k rows per partition, not the data). This is the
  correctness baseline and the right plan under ~10M vectors/query.
- `ivf_topk` (see `ivf.py`) — KMeans-bucketed scan pruning, the
  100 TB path (reference: IVF_SQ index, ``vectors_backend.py:1264-1341``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mcp_vector_search_spark.functions.vectors import dot, l2_norm, unit_expr


def _normalized(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Attach a unit-vector column in two projections (norm first, so
    the transform divides by a column reference, not a re-evaluated
    expression)."""
    return (
        df.withColumn("_nrm", l2_norm(F.col(vec_col)))
        .withColumn(out_col, unit_expr(F.col(vec_col), F.col("_nrm")))
        .drop("_nrm")
    )


def knn_brute_force(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    vec_col: str = "embedding",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of a single query vector.

    `query` is a 1-row DataFrame — broadcast, so the join is a map-side
    nested loop over one row (zero shuffle for the scan side). Both
    sides are unit-normalized BEFORE the join, so per-pair work is one
    dot product instead of dot + two norms (≈3× less float work on the
    hot path). Score is rounded *before* ranking so rank order is
    reproducible across engines; ties break on the explicit `id_col`.
    """
    v = _normalized(vectors, vec_col, "_u")
    q = _normalized(query, query_vec_col, "_uq")
    sim = dot(F.col("_u"), F.col("_uq"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = v.join(F.broadcast(q)).withColumn("cos_sim", sim)
    return (
        scored.drop(query_vec_col, vec_col, "_u", "_uq")
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def topk_per_query(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Batch top-k: every query row × every vector, rank per query.

    The query set broadcasts (small dim table); the vector scan stays
    partitioned — per-partition partial scoring (unit-normalized once
    per row, one dot per pair), then a shuffle on query_id only for
    the final per-query window. At 1000 executors the shuffle carries
    ≤ |queries|·|vectors| scored rows; for large query sets swap in
    the IVF path to prune candidates first.
    """
    v = _normalized(vectors, vec_col, "_u")
    q = _normalized(queries, query_vec_col, "_uq")
    sim = dot(F.col("_u"), F.col("_uq"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = v.join(F.broadcast(q)).withColumn("cos_sim", sim)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop(vec_col, query_vec_col, "_u", "_uq")
    )


def rank_by(df: DataFrame, score_col: str, id_col: str, rank_col: str = "rank") -> DataFrame:
    """1-based global rank after a (re)scoring stage (reference W1,
    ``core/search.py:1049``). Deterministic tiebreak on the id column."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.withColumn(rank_col, F.row_number().over(w))
