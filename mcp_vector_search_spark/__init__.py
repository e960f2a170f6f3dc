"""mcp-vector-search-spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``bobmatnyc/mcp-vector-search``.

Reference behavior surveyed in SURVEY.md; this package re-expresses it
Spark-first: DataFrame/SQL logical plans, Catalyst-optimized physical
execution, Pandas UDFs only where built-ins can't express the semantics.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``io``         : table sources/sinks over the parquet test corpus
- ``functions``  : column-expression library (text, vectors, hashing)
- ``operators``  : relational + search operators (top-k, BM25, RRF, dedup,
                   similarity join, graph traversal, analytics rollups)
- ``plans``      : end-to-end query pipelines (hybrid search, index build)
- ``streaming``  : Structured Streaming incremental-index path
"""

__version__ = "0.1.0"

from mcp_vector_search_spark.session import get_spark  # noqa: F401
