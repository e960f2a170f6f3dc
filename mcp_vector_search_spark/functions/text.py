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


def fingerprint_from_tokens(tokens: Column) -> Column:
    """The token-array core of `doc_fingerprint`, for callers that
    already hold the tokenized array (single-scan plans must not
    re-tokenize — and must not re-implement this inline, or the gate
    and the operator can drift)."""
    return F.md5(F.array_join(tokens, " "))


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint (reference: sha256 chunk ids,
    ``core/models.py:292-303``). md5 here: portable to every SQL oracle."""
    return fingerprint_from_tokens(tokenize(text))


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
    """Share of characters that are not alphanumeric/whitespace.
    Tabs/newlines/CRs are whitespace, not punctuation: counting them
    inflated the ratio ~0.07 on ordinary line-dense text, enough to
    cross HIGH_PUNCT_RATIO from line breaks alone (r6 review #4).
    The oracle SQL uses the same explicit class (Java∩RE2 subset)."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(F.lower(col), "[a-z0-9 \\t\\n\\r]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def distinct_token_ratio(tokens: Column) -> Column:
    """Lexical diversity: |set(tokens)| / |tokens| (0 for empty docs)."""
    return F.when(
        F.size(tokens) > 0,
        F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens),
    ).otherwise(F.lit(0.0))


# Gopher-style repetition / quality signals (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1 — the standard
# LLM-pretraining document filters). All pure column expressions
# (codegen, no shuffle, no UDF): per-doc signals must stay narrow at
# 100 TB. The DuckDB oracle replays each with list functions.


def doc_lines(text: Column | str) -> Column:
    """Non-empty trimmed lines, order-preserving."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(col, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


def dup_line_fraction(lines: Column) -> Column:
    """1 − |distinct lines| / |lines| — Gopher drops docs > 0.30."""
    return F.when(
        F.size(lines) > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
    ).otherwise(F.lit(0.0))


def bullet_line_fraction(lines: Column) -> Column:
    """Fraction of lines starting with a bullet ('-' or '*') —
    Gopher drops docs > 0.90."""
    bullets = F.filter(
        lines,
        lambda x: F.startswith(x, F.lit("-")) | F.startswith(x, F.lit("*")),
    )
    return F.when(
        F.size(lines) > 0, F.size(bullets).cast("double") / F.size(lines)
    ).otherwise(F.lit(0.0))


def ellipsis_line_fraction(lines: Column) -> Column:
    """Fraction of lines ending in '...' — Gopher drops docs > 0.30."""
    ell = F.filter(lines, lambda x: F.endswith(x, F.lit("...")))
    return F.when(
        F.size(lines) > 0, F.size(ell).cast("double") / F.size(lines)
    ).otherwise(F.lit(0.0))


def mean_word_length(tokens: Column) -> Column:
    """Mean token length — Gopher keeps 3..10."""
    total = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.when(
        F.size(tokens) > 0, total.cast("double") / F.size(tokens)
    ).otherwise(F.lit(0.0))


def alpha_word_fraction(tokens: Column) -> Column:
    """Fraction of tokens containing at least one letter — Gopher
    keeps ≥ 0.80 (tokens here are already lowercased alnum runs, so
    the check is 'not purely numeric')."""
    alpha = F.filter(tokens, lambda x: x.rlike("[a-z]"))
    return F.when(
        F.size(tokens) > 0, F.size(alpha).cast("double") / F.size(tokens)
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column | str, tokens: Column) -> Column:
    """(# of '#' chars + # of '...' runs) per word — Gopher drops
    docs > 0.10."""
    col = F.col(text) if isinstance(text, str) else text
    hashes = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
    dots = (
        F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    return F.when(
        F.size(tokens) > 0, (hashes + dots).cast("double") / F.size(tokens)
    ).otherwise(F.lit(0.0))
def _run_fold(grams: Column, finish) -> Column:
    """Linear fold over a SORTED gram array tracking equal-run
    lengths — the O(L log L) way to get per-doc n-gram multiplicities
    without an explode+groupBy shuffle (the same trick q_text_quality
    uses inline for its bigram mode). The accumulator carries
    (prev gram, current run, best run, total occurrences inside
    runs ≥ 2); `finish` folds the last open run in and picks the
    statistic."""
    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit(0).cast("long").alias("dup"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
            # close the PREVIOUS run when the gram changes: runs of
            # length ≥ 2 contribute all their occurrences
            (
                acc["dup"]
                + F.when(
                    (x != acc["prev"]) & (acc["run"] >= 2), acc["run"]
                ).otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
        ),
        finish,
    )


def top_ngram_fraction(grams: Column) -> Column:
    """Fraction of a doc's n-gram occurrences taken by its single most
    frequent n-gram (Gopher Table A1 "top n-gram" repetition filter,
    occurrence-weighted form — the char-weighted variant differs only
    by a length factor). `grams` from `word_ngrams`; 0.0 for docs with
    fewer than n tokens."""
    top = _run_fold(F.array_sort(grams), lambda acc: acc["best"])
    return F.when(
        F.size(grams) > 0, F.round(top.cast("double") / F.size(grams), 6)
    ).otherwise(F.lit(0.0))


def dup_ngram_fraction(grams: Column) -> Column:
    """Fraction of a doc's n-gram occurrences that belong to n-grams
    appearing MORE THAN ONCE in the doc (Gopher Table A1 "duplicate
    n-grams" filter, occurrence-weighted: Gopher drops docs whose
    dup-5..10-gram fraction exceeds ~0.10-0.15). A doc that repeats a
    sentence scores high here even when no single n-gram dominates —
    the signal `top_ngram_fraction` misses."""
    dup = _run_fold(
        F.array_sort(grams),
        # the final open run never hits the x != prev close — add it
        lambda acc: acc["dup"]
        + F.when(acc["run"] >= 2, acc["run"]).otherwise(F.lit(0).cast("long")),
    )
    return F.when(
        F.size(grams) > 0, F.round(dup.cast("double") / F.size(grams), 6)
    ).otherwise(F.lit(0.0))


# F6 NLP entity extraction (reference ``core/nlp_extractor.py``, invoked
# from ``parsers/base.py:240-249``). The reference pulls YAKE keywords,
# backtick code refs, and camel/snake/ACRONYM identifier terms out of
# docstrings. The identifier regexes are pure `regexp_extract_all`
# (RE2-safe: no backrefs/lookaround, portable to DuckDB); the YAKE
# analog is a tf-and-first-position keyword ranking expressed as
# explode → groupBy → window, all Catalyst.

SNAKE_RE = "[a-z][a-z0-9]*(_[a-z0-9]+)+"
CAMEL_RE = "[a-z]+([A-Z][a-z0-9]+)+"
ACRONYM_RE = "[A-Z][A-Z0-9]{2,}"


def extract_identifiers(text: Column | str) -> Column:
    """struct(snake, camel, acronyms) — each an order-preserving array
    of identifier-shaped terms found in the raw (case-preserved) text."""
    col = F.col(text) if isinstance(text, str) else text
    return F.struct(
        F.regexp_extract_all(col, F.lit(SNAKE_RE), 0).alias("snake"),
        F.regexp_extract_all(col, F.lit(CAMEL_RE), 0).alias("camel"),
        F.regexp_extract_all(col, F.lit(ACRONYM_RE), 0).alias("acronyms"),
    )


def backtick_refs(text: Column | str) -> Column:
    """`code ref` spans from prose, backticks stripped."""
    col = F.col(text) if isinstance(text, str) else text
    # group-1 extraction already strips the backticks — no transform
    return F.regexp_extract_all(col, F.lit("`([^`]+)`"), 1)


def top_keywords(
    docs,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """YAKE-analog keyword ranking: per document, the top-`n` tokens by
    (tf DESC, first-position ASC, token ASC). One explode + one
    groupBy + one window — the shuffle is keyed on (doc, token) then
    doc, both safe at corpus scale."""
    from pyspark.sql.window import Window

    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokenize(text_col)).alias("pos", "token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"), F.min("pos").alias("first_pos"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("first_pos"), F.asc("token")
    )
    return (
        tf.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= n)
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("first_pos").cast("long").alias("first_pos"),
            F.col("kw_rank").cast("long").alias("kw_rank"),
        )
    )


def bpe_token_estimate(text: Column | str) -> Column:
    """Deterministic BPE-style token-count estimate, no model needed:
    alphabetic runs cost ceil(len/4) subword units (BPE merges average
    ~4 chars/token on English), every digit is its own token (the
    GPT-style digit split), and every other non-space symbol is one
    token. Pure column expressions — portable to the SQL oracle, and a
    far better context-budget predictor than whitespace counting on
    code or punctuation-heavy text."""
    col = F.col(text) if isinstance(text, str) else text
    words = F.regexp_extract_all(col, F.lit("[A-Za-z]+"), 0)
    alpha = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)),
    )
    digits = F.length(F.regexp_replace(col, "[^0-9]", ""))
    symbols = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return alpha + digits + symbols


# PII masking patterns — applied in list order (email before phone so a
# mailbox's digits are gone before the looser phone pattern runs; the
# masks contain no digits, so later passes never re-match). Patterns
# stay inside the regex subset Java and RE2 interpret identically.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    # international (+-prefixed digit run) OR NANP 3-3-4 shape OR a
    # bare 10-11 digit run; the earlier \+?\d[\d\- ]{7,}\d also matched
    # ISO dates (2026-08-14) and dash-separated ids, corrupting every
    # date in a redacted corpus. The bare-run branch (ADVICE r4)
    # restores recall on unformatted domestic numbers ('5551234567')
    # at a stated cost: any 10-11 digit integer — a Unix epoch-seconds
    # timestamp, AND (because '.' is a \b word boundary) the 10-11
    # digit integer part of a decimal or dotted id ('1234567890.5' →
    # '<PHONE>.5') — is also masked. A lookaround guard would exclude
    # the decimal case but RE2 (the oracle engine) has no lookarounds,
    # and these patterns must stay in the Java∩RE2 subset. Separator-
    # grouped non-'+' international forms ('06 12 34 56 78') remain
    # unmatched by design: that shape is indistinguishable from
    # columns of 2-digit numbers.
    (
        "phone",
        r"(?:\+\d[\d\- ]{7,}\d)|(?:\b\d{3}[\- ]\d{3}[\- ]\d{4}\b)|(?:\b\d{10,11}\b)",
        "<PHONE>",
    ),
]


def redact_pii(text: Column | str) -> Column:
    """Mask emails / IPv4 addresses / phone-number-shaped digit runs —
    the pre-training privacy pass. Pure sequential regexp_replace
    column expressions; replayable in any engine with RE2-compatible
    regexes."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pat, mask in PII_PATTERNS:
        col = F.regexp_replace(col, pat, mask)
    return col


# Content-based language identification — the classic stopword-profile
# heuristic (Cavnar & Trenkle-style rank profiles collapsed to the
# cheapest useful form: per-language function-word hit fractions).
# Profiles are the highest-frequency function words of each language,
# restricted to forms the shared tokenizer preserves (ASCII after
# lower(); accented forms like "está"/"für" split on the non-[a-z0-9]
# boundary, so profiles avoid them — the unaccented cores carry plenty
# of signal). zh is detected by CJK codepoint fraction instead (Chinese
# has no spaces, so token profiles are the wrong tool).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for",
           "on", "with", "as", "was", "at", "this"],
    "es": ["que", "el", "los", "las", "del", "una", "por", "con",
           "para", "es", "al", "como", "pero", "sus", "ya"],
    "fr": ["les", "des", "est", "dans", "pour", "une", "sur", "pas",
           "avec", "sont", "aux", "ce", "ou", "mais", "nous"],
    "de": ["der", "die", "und", "das", "den", "von", "mit", "ist",
           "dem", "ein", "eine", "auf", "nicht", "auch", "sich"],
}
# Ambiguity note: "de"/"la"/"en"/"un" are shared Romance/English forms
# and are deliberately absent; every word above is a top-30 function
# word in exactly one of the four profiles.

CJK_RANGE = r"\x{4e00}-\x{9fff}"  # same \x{...} syntax in Java regex and RE2

LANG_ID_PRIORITY = ["en", "es", "fr", "de", "zh"]
LANG_ID_MIN_SCORE = 0.05


def lang_id(text: Column | str, min_score: float = LANG_ID_MIN_SCORE) -> Column:
    """struct(lang, confidence): content-based language guess.

    Score per language = stopword-hit fraction of the token stream
    (zh: CJK-codepoint fraction of the raw text); the winner is the
    FIRST language in `LANG_ID_PRIORITY` achieving the max score —
    a deterministic tiebreak the SQL oracle mirrors as the same CASE
    cascade. Below `min_score` → 'unknown' (too little signal).

    Pure column expressions — per-row, zero shuffle, oracle-portable.
    The reference scopes files by extension metadata
    (`core/models.py` language field); this is the corpus-curation
    analog for natural-language text where no metadata exists.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = tokenize(col)
    nt = F.size(toks)
    scores: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))  # noqa: B023
        scores[lang] = F.when(nt > 0, hits / nt).otherwise(F.lit(0.0))
    cjk = F.length(F.regexp_replace(col, f"[^{CJK_RANGE}]", ""))
    scores["zh"] = F.when(
        F.length(col) > 0, cjk / F.length(col)
    ).otherwise(F.lit(0.0))

    m = F.greatest(*[scores[lang] for lang in LANG_ID_PRIORITY])
    pred = F.when(m < F.lit(min_score), F.lit("unknown"))
    for lang in LANG_ID_PRIORITY:
        pred = pred.when(scores[lang] == m, F.lit(lang))
    return F.struct(
        pred.alias("lang"), F.round(m, 6).alias("confidence")
    )


def pii_counts(text: Column | str) -> Column:
    """struct(n_email, n_ip, n_phone): per-kind match counts on the
    ORIGINAL text (each pattern counted independently) — the audit
    column a redaction pass reports."""
    col = F.col(text) if isinstance(text, str) else text
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ]
    )
