"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``mcp_vector_search_spark.registry`` —
one (spark callable, DuckDB oracle) pair per implemented operator
from SURVEY.md §2; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mcp_vector_search_spark.registry import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end hybrid
    search plan (BM25 leg ⊕ brute-force kNN leg → RRF fusion → top-k),
    reference ``core/search.py:215-432``."""
    from mcp_vector_search_spark.registry import q_hybrid_rrf

    return q_hybrid_rrf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame with
    column names/dtypes aligned to the matching oracle.
    """
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry.
    Keys missing here (none currently) would get a rows-only check.
    """
    return dict(ORACLE_SQL)
