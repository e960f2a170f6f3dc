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


# Information-Architecture hierarchy (reference ``kg_builder.py:39-57``
# IA_GROUPS): doc_category → Topic group
IA_GROUPS: dict[str, list[str]] = {
    "Orientation": ["readme", "contributing", "license", "changelog"],
    "Guides & Tutorials": [
        "guide",
        "tutorial",
        "example",
        "setup",
        "faq",
        "troubleshooting",
    ],
    "Architecture & Design": ["design", "spec", "research", "internal", "report"],
    "API Reference": ["api_doc"],
    "Operations": ["deployment", "configuration", "performance", "security"],
    "Lifecycle": ["roadmap", "release_notes", "upgrade_guide", "migration", "bugfix"],
    "Testing": ["test_doc", "other"],
}
CATEGORY_TO_IA_GROUP = {c: g for g, cats in IA_GROUPS.items() for c in cats}

# reference ``kg_builder.py:3387-3450`` framework detection patterns
FRAMEWORK_PATTERNS: dict[str, tuple[str, str]] = {
    "fastapi": ("web", "FastAPI"),
    "django": ("web", "Django"),
    "flask": ("web", "Flask"),
    "pytest": ("testing", "pytest"),
    "unittest": ("testing", "unittest"),
    "sqlalchemy": ("orm", "SQLAlchemy"),
    "pydantic": ("validation", "Pydantic"),
    "numpy": ("scientific", "NumPy"),
    "pandas": ("data", "Pandas"),
    "requests": ("http", "Requests"),
    "aiohttp": ("http", "aiohttp"),
    "click": ("cli", "Click"),
    "typer": ("cli", "Typer"),
}


def build_ontology(
    files: DataFrame, path_col: str = "path", text_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Document / Topic / ProgrammingLanguage node tables + HAS_TOPIC /
    WRITTEN_IN edges (reference Document-ontology KG node types,
    ``knowledge_graph.py:26-160``, build ``kg_builder.py:2154-2215``).

    → (nodes(id, name, entity_type, doc_category, word_count,
        section_count), edges(src, dst, rel)). Everything is column
    expressions over one file scan: the classifier when-ladder assigns
    doc_category, a second ladder maps category → IA Topic group, and
    the extension → language map builds ProgrammingLanguage nodes.
    """
    from mcp_vector_search_spark.functions.classify import categorize_path
    from mcp_vector_search_spark.sources.discovery import EXTENSION_LANGUAGE

    cat = categorize_path(path_col)
    topic_expr = None
    for c, g in CATEGORY_TO_IA_GROUP.items():
        cond = F.col("doc_category") == c
        topic_expr = (
            F.when(cond, g) if topic_expr is None else topic_expr.when(cond, g)
        )
    topic_expr = topic_expr.otherwise("Uncategorized")

    ext = F.lower(F.element_at(F.split(F.col(path_col), r"\."), -1))
    lang_expr = None
    for e, lang in EXTENSION_LANGUAGE.items():
        cond = ext == e
        lang_expr = (
            F.when(cond, lang) if lang_expr is None else lang_expr.when(cond, lang)
        )
    lang_expr = lang_expr.otherwise(F.lit(None))

    # split('\s+') keeps empty-string tokens at the boundaries: ''
    # counted 1 word and '  hi there ' counted 4 — filter them like
    # tokenize() does (r6 review #4)
    word_count = (
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""))
        .cast("long")
        if text_col
        else F.lit(None).cast("long")
    )
    section_count = (
        F.size(F.filter(F.split(F.col(text_col), "\n"), lambda l: l.rlike("^#{1,6} ")))
        .cast("long")
        if text_col
        else F.lit(None).cast("long")
    )

    base = files.select(
        F.col(path_col).alias("path"),
        cat.alias("doc_category"),
        word_count.alias("word_count"),
        section_count.alias("section_count"),
        lang_expr.alias("_lang"),
    ).withColumn("topic", topic_expr)

    doc_nodes = base.select(
        F.concat(F.lit("doc:"), F.col("path")).alias("id"),
        F.col("path").alias("name"),
        F.lit("Document").alias("entity_type"),
        "doc_category",
        "word_count",
        "section_count",
    )
    topic_nodes = base.select("topic").distinct().select(
        F.concat(F.lit("topic:"), F.col("topic")).alias("id"),
        F.col("topic").alias("name"),
        F.lit("Topic").alias("entity_type"),
        F.lit(None).cast("string").alias("doc_category"),
        F.lit(None).cast("long").alias("word_count"),
        F.lit(None).cast("long").alias("section_count"),
    )
    lang_nodes = (
        base.filter(F.col("_lang").isNotNull())
        .select("_lang")
        .distinct()
        .select(
            F.concat(F.lit("lang:"), F.col("_lang")).alias("id"),
            F.col("_lang").alias("name"),
            F.lit("ProgrammingLanguage").alias("entity_type"),
            F.lit(None).cast("string").alias("doc_category"),
            F.lit(None).cast("long").alias("word_count"),
            F.lit(None).cast("long").alias("section_count"),
        )
    )
    nodes = doc_nodes.unionByName(topic_nodes).unionByName(lang_nodes)

    topic_edges = base.select(
        F.concat(F.lit("doc:"), F.col("path")).alias("src"),
        F.concat(F.lit("topic:"), F.col("topic")).alias("dst"),
        F.lit("HAS_TOPIC").alias("rel"),
    )
    lang_edges = base.filter(F.col("_lang").isNotNull()).select(
        F.concat(F.lit("doc:"), F.col("path")).alias("src"),
        F.concat(F.lit("lang:"), F.col("_lang")).alias("dst"),
        F.lit("WRITTEN_IN").alias("rel"),
    )
    return nodes, topic_edges.unionByName(lang_edges)


def section_nodes(
    files: DataFrame, path_col: str = "path", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Section nodes + CONTAINS_SECTION edges from markdown headings
    (reference Document ontology relationships, ``kg_builder.py``
    CONTAINS_SECTION): one posexplode over heading lines — no UDF.
    → (nodes(id, name, entity_type, level), edges(src, dst, rel))."""
    heads = (
        files.select(
            F.col(path_col).alias("path"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .filter(F.col("line").rlike("^#{1,6} "))
        .select(
            "path",
            "pos",
            F.length(F.regexp_extract("line", "^(#{1,6}) ", 1)).alias("level"),
            F.trim(F.regexp_replace("line", "^#{1,6} ", "")).alias("heading"),
        )
    )
    nodes = heads.select(
        F.concat(F.lit("sec:"), F.col("path"), F.lit("#"), F.col("pos")).alias("id"),
        F.col("heading").alias("name"),
        F.lit("Section").alias("entity_type"),
        F.col("level").cast("long").alias("level"),
    )
    edges = heads.select(
        F.concat(F.lit("doc:"), F.col("path")).alias("src"),
        F.concat(F.lit("sec:"), F.col("path"), F.lit("#"), F.col("pos")).alias("dst"),
        F.lit("CONTAINS_SECTION").alias("rel"),
    )
    return nodes, edges


def detect_frameworks(deps: DataFrame, dep_col: str = "dep") -> DataFrame:
    """ProgrammingFramework nodes from dependency rows (reference
    ``kg_builder.py:3387-3450`` parses pyproject/requirements
    driver-side; at corpus scale dependency entries are rows).
    Normalizes `fastapi>=0.100[extra]` → `fastapi`, matches the
    pattern table → (id, name, category, language_id)."""
    pkg = F.lower(
        F.trim(F.split(F.split(F.split(F.col(dep_col), r"\[").getItem(0), ">=").getItem(0), "==").getItem(0))
    )
    cat_expr, name_expr = None, None
    for p, (c, display) in FRAMEWORK_PATTERNS.items():
        cond = F.col("_pkg") == p
        cat_expr = F.when(cond, c) if cat_expr is None else cat_expr.when(cond, c)
        name_expr = (
            F.when(cond, display) if name_expr is None else name_expr.when(cond, display)
        )
    return (
        deps.withColumn("_pkg", pkg)
        .filter(F.col("_pkg").isin(list(FRAMEWORK_PATTERNS)))
        .select("_pkg")
        .distinct()
        .select(
            F.concat(F.lit("framework:"), F.col("_pkg")).alias("id"),
            name_expr.alias("name"),
            cat_expr.alias("category"),
            F.lit("lang:python").alias("language_id"),
        )
    )


def repo_nodes(
    commits: DataFrame,
    project_name: str,
    branch: str = "main",
    repo_url: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Version-control side of the 12-node-table graph (reference
    ``knowledge_graph.py:50-160``: Person, Project, Repository, Branch,
    Commit) → (nodes, edges).

    nodes(id, name, entity_type, meta): one Person per author email —
    id = ``person:<sha2(email)>`` (the reference's privacy hash, raw
    email never leaves the aggregation), with commit count + first/last
    commit timestamps in `meta`; one Project / Repository / Branch row;
    one Commit node per sha. edges(src, dst, rel): Person AUTHORED
    Commit, Commit IN_BRANCH Branch, Branch OF_REPO Repository,
    Repository OF_PROJECT Project.

    Scale: authors aggregate with one groupBy over commit metadata
    (thousands of rows); everything else is column expressions."""
    person_id = F.concat(F.lit("person:"), F.sha2(F.col("author_email"), 256))
    persons = (
        commits.groupBy("author_email")
        .agg(
            F.max_by("author", "ts").alias("name"),
            F.count("*").alias("n_commits"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            person_id.alias("id"),
            F.col("name"),
            F.lit("Person").alias("entity_type"),
            F.to_json(
                F.struct("n_commits", "first_ts", "last_ts")
            ).alias("meta"),
        )
    )
    commit_nodes = commits.select(
        F.concat(F.lit("commit:"), F.col("commit_sha")).alias("id"),
        F.col("subject").alias("name"),
        F.lit("Commit").alias("entity_type"),
        F.to_json(F.struct("ts", "author")).alias("meta"),
    )
    spark = commits.sparkSession
    fixed = spark.createDataFrame(
        [
            (f"project:{project_name}", project_name, "Project", repo_url),
            (f"repo:{project_name}", project_name, "Repository", repo_url),
            (f"branch:{project_name}#{branch}", branch, "Branch", ""),
        ],
        "id string, name string, entity_type string, meta string",
    )
    nodes = persons.unionByName(commit_nodes).unionByName(fixed)

    authored = commits.select(
        person_id.alias("src"),
        F.concat(F.lit("commit:"), F.col("commit_sha")).alias("dst"),
        F.lit("AUTHORED").alias("rel"),
    )
    in_branch = commits.select(
        F.concat(F.lit("commit:"), F.col("commit_sha")).alias("src"),
        F.lit(f"branch:{project_name}#{branch}").alias("dst"),
        F.lit("IN_BRANCH").alias("rel"),
    )
    hierarchy = spark.createDataFrame(
        [
            (f"branch:{project_name}#{branch}", f"repo:{project_name}", "OF_REPO"),
            (f"repo:{project_name}", f"project:{project_name}", "OF_PROJECT"),
        ],
        "src string, dst string, rel string",
    )
    edges = authored.unionByName(in_branch).unionByName(hierarchy)
    return nodes, edges


def call_edges(
    chunks: DataFrame,
    id_col: str = "chunk_id",
    name_col: str = "name",
    calls_col: str = "calls",
    path_col: str = "file_path",
    cross_file_only: bool = True,
    callee_names: list[str] | None = None,
) -> DataFrame:
    """kg_edges(src, dst) from exploded call names joined to chunk
    names (reference J12: caller-relationship join with the
    ``file_path != file_path`` theta predicate).

    `callee_names` (r12; guide §3.2 in spirit — reduce both join
    sides before the shuffle): when the CALLER only consumes edges
    whose target name matches a known set (the J9 boost lookup),
    pass that set here — both join sides are pre-filtered
    case-insensitively at the scan, so the full edge set is never
    built. Equivalent by construction for such callers: the join key
    is the exact name, so a pair survives the downstream
    lower(name)-match iff both sides pass this filter."""
    lowered = (
        [n.lower() for n in callee_names] if callee_names is not None else None
    )
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
    if lowered is not None:
        callers = callers.filter(F.lower(F.col("_callee")).isin(lowered))
        targets = targets.filter(F.lower(F.col("_callee")).isin(lowered))
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
    # case-insensitive match, like entity_resolve's exact→lower ladder:
    # preprocess_query lowercases every term, so a case-sensitive isin
    # would silently never boost capitalized entity names (r6 review #4)
    matched = nodes.filter(
        F.lower(F.col("name")).isin([t.lower() for t in query_terms])
    ).select(F.col("id").alias("dst"))
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
