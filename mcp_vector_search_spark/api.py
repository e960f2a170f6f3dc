"""Public query API — the reference's MCP tool surface
(``mcp/tool_schemas.py:46-1380``, dispatch ``mcp/server.py:303-460``)
as one façade over the DataFrame programs. A user of the reference
switches by calling the same-named method; every method returns a
DataFrame (lazily planned — callers compose or collect).

The façade holds the three corpus frames (docs, chunk metadata,
vectors) plus lazily-built artifacts (KG edges, IVF layout). Nothing
here adds logic: each method is the operator composition the
matching tool runs, so correctness rides on the oracle-gated
registry queries underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SparkProject:
    """One indexed project = (documents, vectors[, chunk metadata])."""

    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        vectors: DataFrame,
        chunk_meta: DataFrame | None = None,
    ):
        self.spark = spark
        self.docs = docs
        self.vectors = vectors
        self.chunk_meta = chunk_meta
        self._kg_edges: DataFrame | None = None

    # ---------------------------------------------------------- search

    def search_code(self, query: str, limit: int = 10) -> DataFrame:
        """BM25 keyword search (tool `search_code`)."""
        from mcp_vector_search_spark.functions.query import preprocess_query
        from mcp_vector_search_spark.operators.bm25 import bm25_topk

        return bm25_topk(self.docs, preprocess_query(query).split(), limit)

    def search_similar(self, doc_id: int, limit: int = 10) -> DataFrame:
        """Nearest neighbors of an indexed document (tool
        `search_similar`)."""
        from mcp_vector_search_spark.operators.topk import knn_brute_force

        qv = self.vectors.filter(F.col("vec_id") == doc_id).select(
            F.col("embedding").alias("query_vec")
        )
        # over-retrieve by one, drop self, re-cap: with tied duplicate
        # vectors the target may not be inside the top limit+1, in
        # which case the filter removes nothing and the cap matters
        return (
            knn_brute_force(self.vectors, qv, limit + 1)
            .filter(F.col("vec_id") != doc_id)
            .limit(limit)
        )

    def search_hybrid(
        self, query: str, query_vec: DataFrame, limit: int = 10, alpha: float = 0.7
    ) -> DataFrame:
        """BM25 ⊕ vector RRF fusion (tool `search_hybrid`). The query
        is preprocessed like `search_code` — postings terms are
        lowercase tokens, so raw-cased input would silently empty the
        BM25 leg."""
        from mcp_vector_search_spark.functions.query import preprocess_query
        from mcp_vector_search_spark.plans.hybrid import hybrid_search

        return hybrid_search(
            self.docs,
            self.vectors,
            preprocess_query(query).split(),
            query_vec,
            k=limit,
            alpha=alpha,
        )

    def search_context(
        self, query: str, query_vec: DataFrame, limit: int = 10
    ) -> DataFrame:
        """Full pipeline incl. rescoring + MMR (tool `search_context`);
        requires chunk metadata."""
        from mcp_vector_search_spark.plans.search import full_search

        assert self.chunk_meta is not None, "search_context needs chunk_meta"
        return full_search(
            self.docs, self.chunk_meta, self.vectors, query, query_vec, k=limit
        )

    # ------------------------------------------------------- analytics

    def get_project_status(self) -> DataFrame:
        """Index stats rollup (tool `get_project_status`)."""
        from mcp_vector_search_spark.operators.analytics import lang_distribution

        return lang_distribution(self.docs)

    def analyze_project(self) -> DataFrame:
        """Per-file rollups + health grades (tool `analyze_project`)."""
        from mcp_vector_search_spark.operators.analytics import source_rollup

        return source_rollup(self.docs)

    def find_smells(self, chunks: DataFrame) -> DataFrame:
        """Smell detection over chunk metrics (tool `find_smells`)."""
        from mcp_vector_search_spark.operators.smells import detect_smells

        return detect_smells(chunks)

    def get_complexity_hotspots(self, n: int = 10) -> DataFrame:
        """Top-N hotspots (tool `get_complexity_hotspots`)."""
        from mcp_vector_search_spark.operators.analytics import hotspots

        return hotspots(self.docs, n=n)

    def check_circular_dependencies(self, edges: DataFrame) -> DataFrame:
        """Short-cycle members (tool `check_circular_dependencies`)."""
        from mcp_vector_search_spark.operators.graph import cycle_nodes

        return cycle_nodes(edges)

    # -------------------------------------------------------------- KG

    def kg_build(self, chunks: DataFrame) -> DataFrame:
        """Construct + memoize the call-edge list (tool `kg_build`)."""
        from mcp_vector_search_spark.operators.kg import call_edges

        self._kg_edges = call_edges(
            chunks,
            id_col="doc_id",
            name_col="name",
            calls_col="calls",
            path_col="source",
        )
        return self._kg_edges

    def kg_stats(self) -> DataFrame:
        """Node/edge degree stats (tool `kg_stats`)."""
        from mcp_vector_search_spark.operators.graph import degree

        assert self._kg_edges is not None, "call kg_build first"
        return degree(self._kg_edges)

    def find_related(self, entity_id, max_hops: int = 2) -> DataFrame:
        """Bounded BFS neighborhood (tool `kg_query` / find_related)."""
        from mcp_vector_search_spark.operators.graph import bfs_min_hops

        assert self._kg_edges is not None, "call kg_build first"
        start = self.spark.createDataFrame([(entity_id,)], ["id"])
        return bfs_min_hops(self._kg_edges, start, max_hops)

    def trace_execution_flow(self, entity_id, max_hops: int = 3) -> DataFrame:
        """Path enumeration from an entry point (tool
        `trace_execution_flow`)."""
        from mcp_vector_search_spark.operators.graph import trace_paths

        assert self._kg_edges is not None, "call kg_build first"
        return trace_paths(self._kg_edges, entity_id, max_hops)
