"""Scoring functions: sigmoid normalization (F9), the 8-factor
heuristic rescorer (F10), boilerplate penalty (P7), time decay (F14).

All pure Catalyst column expressions — the reference's per-result
Python loop (``core/result_ranker.py:10-208``) becomes one projection
over the candidate DataFrame, fully whole-stage-codegen'd; no UDFs,
no driver round-trip, so the same rescorer runs on 30 candidates or
30 billion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference constants (``result_ranker.py:10-27``)
BOOST_EXACT_IDENTIFIER = 0.15
BOOST_PARTIAL_IDENTIFIER = 0.05
BOOST_FILE_NAME_EXACT = 0.08
BOOST_FILE_NAME_PARTIAL = 0.03
BOOST_FUNCTION_CHUNK = 0.05
BOOST_CLASS_CHUNK = 0.03
BOOST_SOURCE_FILE = 0.02
BOOST_SHALLOW_PATH = 0.02
PENALTY_TEST_FILE = -0.02
PENALTY_DEEP_PATH = -0.01
PENALTY_BOILERPLATE = -0.15

SOURCE_EXTS = (".py", ".js", ".ts", ".java", ".cpp", ".c", ".go", ".rs")

# Language-keyed boilerplate names (``core/boilerplate.py``; python set
# mirrored, others available the same way)
PYTHON_BOILERPLATE = (
    "__init__", "__str__", "__repr__", "__eq__", "__hash__", "__len__",
    "__iter__", "__next__", "__enter__", "__exit__", "main",
    "setUp", "tearDown", "setUpClass", "tearDownClass",
)


def sigmoid(score: Column) -> Column:
    """F9 cross-encoder logit normalization ``1/(1+e^{-s})``
    (``core/search.py:1280-1288``)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-score))


def time_decay(last_modified: Column, now: Column, half_life_days: float) -> Column:
    """F14 exponential age decay ``0.5^(age_days/half_life)``
    (``knowledge_graph.py:180-193``); clamped at 1 for future dates."""
    age_days = F.datediff(now, last_modified).cast("double")
    return F.least(F.lit(1.0), F.pow(F.lit(0.5), age_days / F.lit(half_life_days)))


def boilerplate_penalty(
    name: Column, query_words: list[str], penalty: float = PENALTY_BOILERPLATE
) -> Column:
    """P7: penalize boilerplate names unless the query asked for them
    (reference preserves explicitly-queried boilerplate,
    ``boilerplate.py`` get_penalty)."""
    is_bp = F.lower(name).isin([b.lower() for b in PYTHON_BOILERPLATE])
    queried = F.lower(name).isin([w.lower() for w in query_words])
    return F.when(is_bp & ~queried, F.lit(penalty)).otherwise(F.lit(0.0))


def _count_matches(words: list[str], haystack: Column) -> Column:
    """How many query words occur as substrings of `haystack`.
    Empty word list → 0 (an empty query must not blow up the plan)."""
    if not words:
        return F.lit(0)
    hits = [F.when(haystack.contains(w), 1).otherwise(0) for w in words]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return total


def heuristic_rescore(
    results: DataFrame,
    query: str,
    score_col: str = "score",
    name_col: str = "name",
    file_path_col: str = "file_path",
    content_col: str = "content",
    chunk_type_col: str = "chunk_type",
    round_to: int | None = 6,
) -> DataFrame:
    """F10: the reference's 8-factor rescorer as one projection
    (``result_ranker.py:31-142``). Adds `rescored` capped at 1.0.

    Factor mapping (identical constants): identifier exact/partial,
    filename exact/partial, content word density (≤0.1), chunk-type,
    source-file ext, test penalty, path depth (≤3 boost, >5 penalty),
    boilerplate penalty. NLP-entity boosts (factor 8) layer on the
    same shape once an entity column exists.
    """
    q = query.lower()
    words = list(dict.fromkeys(q.split()))
    n_words = max(len(words), 1)  # density divisor; empty query → no word factors
    name_l = F.lower(F.coalesce(F.col(name_col), F.lit("")))
    file_name = F.lower(F.element_at(F.split(F.col(file_path_col), "/"), -1))
    content_l = F.lower(F.coalesce(F.col(content_col), F.lit("")))
    depth = F.size(F.split(F.col(file_path_col), "/"))
    n_matches = _count_matches(words, content_l)

    score = (
        F.col(score_col)
        + F.when(name_l.contains(q), BOOST_EXACT_IDENTIFIER).otherwise(0.0)
        + _count_matches(words, name_l).cast("double") * BOOST_PARTIAL_IDENTIFIER
        + F.when(file_name.contains(q), BOOST_FILE_NAME_EXACT).otherwise(0.0)
        + _count_matches(words, file_name).cast("double") * BOOST_FILE_NAME_PARTIAL
        + F.when(
            n_matches > 0, (n_matches.cast("double") / n_words) * 0.1
        ).otherwise(0.0)
        + F.when(F.col(chunk_type_col) == "function", BOOST_FUNCTION_CHUNK)
        .when(F.col(chunk_type_col) == "class", BOOST_CLASS_CHUNK)
        .otherwise(0.0)
        + F.when(
            F.lower(F.col(file_path_col)).rlike(
                "\\.(" + "|".join(e[1:] for e in SOURCE_EXTS) + ")$"
            ),
            BOOST_SOURCE_FILE,
        ).otherwise(0.0)
        + F.when(file_name.contains("test"), PENALTY_TEST_FILE).otherwise(0.0)
        + F.when(depth <= 3, BOOST_SHALLOW_PATH)
        .when(depth > 5, PENALTY_DEEP_PATH)
        .otherwise(0.0)
        + boilerplate_penalty(F.col(name_col), words)
    )
    out = F.least(F.lit(1.0), score)
    if round_to is not None:
        out = F.round(out, round_to)
    return results.withColumn("rescored", out)
