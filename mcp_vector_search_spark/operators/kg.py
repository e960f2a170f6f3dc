"""Knowledge-graph construction and queries as DataFrames (reference
G10 ``core/kg_builder.py``, J12 ``core/relationships.py:353-428``, G7
``knowledge_graph.py:3051-3139``).

The reference materializes a KuzuDB property graph; here the graph IS
two DataFrames (kg_nodes, kg_edges) and every Cypher query is a join
program. Edge construction is the J12 shape: explode the per-chunk
`calls` list and equi-join callee names to chunk names — one shuffle
keyed on the name, skew-handled by AQE (a popular name like `main` is
exactly the skewed-key case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_nodes(
    chunks: DataFrame,
    id_col: str = "chunk_id",
    name_col: str = "name",
    type_col: str = "chunk_type",
    path_col: str = "file_path",
) -> DataFrame:
    """kg_nodes(id, name, entity_type, file_path) — one node per chunk
    (reference CodeEntity, ``knowledge_graph.py:26-160``)."""
    return chunks.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.col(type_col).alias("entity_type"),
        F.col(path_col).alias("file_path"),
    )


def call_edges(
    chunks: DataFrame,
    id_col: str = "chunk_id",
    name_col: str = "name",
    calls_col: str = "calls",
    path_col: str = "file_path",
    cross_file_only: bool = True,
) -> DataFrame:
    """kg_edges(src, dst) from exploded call names joined to chunk
    names (reference J12: caller-relationship join with the
    ``file_path != file_path`` theta predicate)."""
    callers = chunks.select(
        F.col(id_col).alias("src"),
        F.col(path_col).alias("_src_path"),
        F.explode(F.col(calls_col)).alias("_callee"),
    )
    targets = chunks.select(
        F.col(id_col).alias("dst"),
        F.col(name_col).alias("_callee"),
        F.col(path_col).alias("_dst_path"),
    )
    joined = callers.join(targets, "_callee")
    if cross_file_only:
        joined = joined.filter(F.col("_src_path") != F.col("_dst_path"))
    return joined.select("src", "dst").distinct()


def entity_resolve(
    nodes: DataFrame, query_name: str, name_col: str = "name"
) -> DataFrame:
    """G1 entity resolution: exact → prefix → substring match ladder
    (reference ``knowledge_graph.py:2907-2981``), first tier that hits
    wins. Expressed as a tier column + min-tier filter — one scan."""
    q = query_name.lower()
    name_l = F.lower(F.col(name_col))
    tier = (
        F.when(name_l == q, 1)
        .when(name_l.startswith(q), 2)
        .when(name_l.contains(q), 3)
        .otherwise(None)
    )
    tiered = nodes.withColumn("_tier", tier).filter(F.col("_tier").isNotNull())
    best = tiered.agg(F.min("_tier").alias("_best"))
    return tiered.join(F.broadcast(best), F.col("_tier") == F.col("_best")).drop(
        "_tier", "_best"
    )


def tag_query(doc_tags: DataFrame, required: list[str]) -> DataFrame:
    """G7 tag query with AND semantics: ids having ALL required tags
    (reference sections ``HAS_TAG`` groupBy + count==n). doc_tags =
    (doc_id, tag) exploded edge list."""
    return (
        doc_tags.filter(F.col("tag").isin(required))
        .groupBy("doc_id")
        .agg(F.countDistinct("tag").alias("_n"))
        .filter(F.col("_n") == len(required))
        .select("doc_id")
    )


def kg_boost(
    hits: DataFrame,
    edges: DataFrame,
    nodes: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    score_col: str = "score",
    boost: float = 0.02,
) -> DataFrame:
    """J9 KG-boost lookup (reference ``core/search.py:885-936``): for
    each search hit, walk 1 hop in the knowledge graph; if any related
    entity's name matches a query term, add ``boost`` to the score.

    Plan shape: hits ⋈ edges (equi on src) ⋈ nodes (equi on dst,
    name pre-filtered to the query terms so the join input is tiny and
    broadcast-able), distinct hit ids, then a left join back — the
    boost is a ``coalesce`` column expression, no UDF. At scale the
    name filter pushes to the node scan and the boosted-id set is
    orders smaller than the hit set.
    """
    matched = nodes.filter(F.col("name").isin(query_terms)).select(
        F.col("id").alias("dst")
    )
    boosted_ids = (
        edges.join(F.broadcast(matched), "dst")
        .select(F.col("src").alias(id_col))
        .distinct()
        .withColumn("_kg_boost", F.lit(boost))
    )
    return hits.join(boosted_ids, id_col, "left").withColumn(
        "boosted_score",
        F.round(F.col(score_col) + F.coalesce(F.col("_kg_boost"), F.lit(0.0)), 6),
    ).drop("_kg_boost")
