"""Text analysis column expressions.

Re-expresses the reference's tokenizer + text pipeline (BM25 tokenizer
``bm25_backend.py:297-375``, contextual text builder
``core/context_builder.py:29-154``) as Catalyst expressions. The
tokenizer here is deliberately a *spec-identical-in-SQL* one
(`lower` + split on non-alphanumerics) so every downstream operator
(BM25, dedup, fingerprints) is hash-checkable against an ANSI-SQL
oracle; the reference's camelCase/snake_case subword passes only matter
for source-code corpora and layer on in the parser stage.

All functions return Columns; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex shared verbatim with the DuckDB oracle (Java regex and RE2 agree
# on this class).
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(text: Column | str) -> Column:
    """lowercase → split on non-alphanumeric runs → drop empties.

    array<string>; order-preserving (positions matter for shingles).
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


def normalized_text(text: Column | str) -> Column:
    """Canonical single-space form used for exact-dup fingerprints."""
    return F.array_join(tokenize(text), " ")


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint (reference: sha256 chunk ids,
    ``core/models.py:292-303``). md5 here: portable to every SQL oracle."""
    return F.md5(normalized_text(text))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Order-preserving word n-gram shingles (joined with '_').

    Built by zipping the token array with its own 1..n-1 shifts —
    `tokens` is referenced only a constant number of times at the TOP
    level of the expression. (The round-1 version sliced `tokens`
    inside a per-position lambda; expressions inside higher-order
    lambdas re-evaluate per element, so an upstream `tokenize` ran
    O(L) times per row — 7× slower on the bench corpus.)

    Stays in codegen, no UDF. Empty array when the doc has < n tokens.
    """
    grams = tokens
    for j in range(1, n):
        shifted = F.slice(
            tokens, j + 1, F.greatest(F.size(tokens) - j, F.lit(1))
        )
        # zip pads the shorter side with null; concat propagates the
        # null so incomplete trailing grams die naturally
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit("_"), b))
    return F.when(
        F.size(tokens) >= n, F.slice(grams, 1, F.size(tokens) - n + 1)
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


def punct_ratio(text: Column | str) -> Column:
    """Share of characters that are not alphanumeric/space."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(F.lower(col), "[a-z0-9 ]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def distinct_token_ratio(tokens: Column) -> Column:
    """Lexical diversity: |set(tokens)| / |tokens| (0 for empty docs)."""
    return F.when(
        F.size(tokens) > 0,
        F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens),
    ).otherwise(F.lit(0.0))
