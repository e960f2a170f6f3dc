"""File-discovery scan (reference S1, ``core/file_discovery.py:159-316``:
recursive walk + 71 default ignore patterns + extension filter).

In Spark the "walk" is a listing DataFrame (from `binaryFile` reads, a
catalog, or an inventory table); discovery becomes a *filter
expression* — rlike on compiled ignore patterns + extension map — that
Catalyst evaluates during the scan. No driver-side walking: at 100 TB
the inventory itself is a table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Representative subset of the reference's 71 default ignore patterns
# (``file_discovery.py:78-126``); extend the same way it does.
DEFAULT_IGNORE_REGEXES = [
    r"(^|/)\.git(/|$)",
    r"(^|/)node_modules(/|$)",
    r"(^|/)__pycache__(/|$)",
    r"(^|/)\.venv(/|$)",
    r"(^|/)build(/|$)",
    r"(^|/)dist(/|$)",
    r"\.min\.(js|css)$",
    r"\.(pyc|pyo|so|o|a|class)$",
    r"(^|/)\.DS_Store$",
]

EXTENSION_LANGUAGE = {
    "py": "python",
    "js": "javascript",
    "ts": "typescript",
    "java": "java",
    "go": "go",
    "rs": "rust",
    "md": "markdown",
    "txt": "text",
}


def is_ignored(path: Column | str) -> Column:
    col = F.col(path) if isinstance(path, str) else path
    pred = F.lit(False)
    for rx in DEFAULT_IGNORE_REGEXES:
        pred = pred | col.rlike(rx)
    return pred


def language_of(path: Column | str) -> Column:
    col = F.col(path) if isinstance(path, str) else path
    ext = F.lower(F.element_at(F.split(col, "\\."), -1))
    expr = F.lit("unknown")
    for e, lang in EXTENSION_LANGUAGE.items():
        expr = F.when(ext == e, lang).otherwise(expr)
    return expr


def discover(files: DataFrame, path_col: str = "path") -> DataFrame:
    """Filter a file-listing DataFrame to indexable files and attach
    the detected language — S1 as one codegen'd predicate."""
    return files.filter(~is_ignored(path_col)).withColumn(
        "language", language_of(path_col)
    )


# Monorepo subproject detection (reference ``utils/monorepo.py:46-150``
# + chunk assignment ``core/chunk_processor.py:269-273``): marker files
# identify subproject roots; every file belongs to its NEAREST
# (longest-prefix) enclosing root — the `project_name` column of the
# vectors table (``core/vectors_backend.py:37-70``).
SUBPROJECT_MARKERS = [
    "package.json", "pyproject.toml", "setup.py", "go.mod",
    "Cargo.toml", "pom.xml", "lerna.json",
]

# reference EXCLUDED_SUBPROJECT_DIRS (``utils/monorepo.py:11-35``):
# test/docs/build dirs never count as subprojects
EXCLUDED_SUBPROJECT_DIRS = [
    "tests", "test", "examples", "example", "docs", "doc", "scripts",
    "tools", "benchmarks", "benchmark", "node_modules", ".git",
    "build", "dist", "__pycache__",
]


def subproject_roots(files: DataFrame, path_col: str = "path") -> DataFrame:
    """(root_dir, subproject) from marker files in a listing DataFrame.

    A marker at the repository top level (dirname '') is the project
    itself, not a subproject; a marker under an excluded dir (tests/,
    docs/, build/ …) is skipped — both per the reference's detector.
    Pure filter + string exprs over the listing scan.
    """
    col = F.col(path_col)
    parts = F.split(col, "/")
    base = F.element_at(parts, -1)
    # built from the `parts` expression, not an interpolated SQL
    # fragment: F.expr(f"...{path_col}...") re-split the path twice and
    # broke for column names needing backticks (r6 review #4)
    dir_parts = F.slice(parts, 1, F.size(parts) - 1)
    root = F.array_join(dir_parts, "/")
    excluded = F.arrays_overlap(
        dir_parts, F.array(*[F.lit(d) for d in EXCLUDED_SUBPROJECT_DIRS])
    )
    return (
        files.filter(base.isin(SUBPROJECT_MARKERS) & ~excluded)
        .select(root.alias("root_dir"))
        .filter(F.col("root_dir") != "")
        .distinct()
        .withColumn("subproject", F.element_at(F.split("root_dir", "/"), -1))
    )


def assign_subprojects(
    files: DataFrame,
    roots: DataFrame,
    path_col: str = "path",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """files + `subproject` column: each file's NEAREST enclosing
    subproject root (longest matching prefix), null when outside every
    root — the reference's get_subproject_for_file as a join.

    Scale shape: the join is blocked on the FIRST path segment (an
    equi-key both sides), so a file only meets the roots sharing its
    top-level directory — never |files|×|roots|; the longest-prefix
    pick is a per-file rank over that bounded candidate set. Roots
    tables are small in practice (one row per subproject) and
    broadcast.

    `key_cols` identifies one file row uniquely (defaults to the path
    column — pass the real key when the listing can repeat paths, or
    the longest-prefix rank would collapse duplicates to one row).
    """
    from pyspark.sql.window import Window

    key_cols = key_cols or [path_col]
    fseg = F.element_at(F.split(F.col(path_col), "/"), 1)
    r = roots.withColumn(
        "_rseg", F.element_at(F.split("root_dir", "/"), 1)
    )
    cand = (
        files.withColumn("_fseg", fseg)
        .join(
            F.broadcast(r),
            (F.col("_fseg") == F.col("_rseg"))
            & F.col(path_col).startswith(F.concat("root_dir", F.lit("/"))),
            "left",
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(F.length(F.coalesce(F.col("root_dir"), F.lit("")))),
        F.asc("root_dir"),
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fseg", "_rseg", "root_dir")
    )
