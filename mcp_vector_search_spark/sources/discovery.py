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
