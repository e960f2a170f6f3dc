"""Structure-aware code chunker (reference S2 — the tree-sitter parse,
``parsers/base.py:24-298``, 13 languages). Tree-sitter is a native
dependency; this is the engine's FallbackParser-equivalent: top-level
`def `/`class ` lines open a new chunk, preceding lines form a module
chunk — the same chunk *shape* (type, name, line span) the reference
emits, produced by pure relational ops:

  posexplode(lines) → boundary flag → running sum = chunk_no →
  groupBy (doc, chunk_no) with order-preserving line reassembly.

One shuffle (the groupBy); the running-sum window partitions by doc,
so parallelism is per-document — exactly how the reference
parallelizes its parser pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BOUNDARY_RE = "^(def |class )"
NAME_RE = "^(?:def|class) ([A-Za-z0-9_]+)"


def code_chunks(
    sources: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_no, chunk_type, name, n_lines, chunk_text)."""
    lines = sources.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = lines.withColumn(
        "chunk_no",
        F.sum(F.when(F.col("line").rlike(BOUNDARY_RE), 1).otherwise(0)).over(w),
    )
    grouped = flagged.groupBy("doc_id", "chunk_no").agg(
        F.min_by("line", "pos").alias("_first"),
        F.count("*").alias("n_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("chunk_text"),
    )
    chunk_type = (
        F.when(F.col("_first").startswith("def "), "function")
        .when(F.col("_first").startswith("class "), "class")
        .otherwise("module")
    )
    return grouped.select(
        "doc_id",
        "chunk_no",
        chunk_type.alias("chunk_type"),
        F.regexp_extract("_first", NAME_RE, 1).alias("name"),
        "n_lines",
        "chunk_text",
    )


HIER_BOUNDARY_RE = r"^[ \t]*(async )?(def |class )"
HIER_NAME_RE = r"^(?:async )?(?:def|class) ([A-Za-z0-9_]+)"
DECORATOR_RE = r"^[ \t]*@"


def code_chunks_hierarchical(
    sources: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hierarchical chunk extraction (reference S2 AST parse,
    ``parsers/python.py`` + ``parsers/base.py:24-298``): module →
    class → method chunks with parent links, decorator lists, and
    signature fields — the chunk *shape* tree-sitter produces,
    re-derived relationally (tree-sitter is a native dep absent here;
    tests/test_ast_parity.py holds the golden parity matrix against
    the reference's own AST fixtures, including what the line-regex
    model can NOT recover: multi-line signature params and bodies of
    nested closures).

    → (doc_id, chunk_no, depth, chunk_type, name, parent, decorators,
       params, return_type, n_lines, chunk_text)

    - depth = TRUE nesting depth from a monotonic indent stack over
      the preceding chunks (round 4); parent = the real enclosing
      scope (class OR function), and method/function classification
      follows the enclosing scope's kind, matching the AST view.
    - decorators: the '@' lines immediately preceding a boundary are
      reported on the decorated chunk (they sit in the previous
      chunk's text — one chunk-level lag attaches them).
    - params/return_type parse from the chunk's signature, folded
      across lines until the paren balance closes — multi-line
      signatures and nested-paren/bracket defaults parse to the same
      param list the AST gives (round-4 envelope shrink; see
      tests/test_ast_divergence.py for what still diverges).
    One shuffle (the per-doc groupBy), same as `code_chunks`.
    """
    lines = sources.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    stripped = F.regexp_replace("line", r"^[ \t]+", "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # triple-quote parity: a `def `/`class ` line is NOT a boundary
    # while an odd number of ''' / \"\"\" markers precede it (it's
    # docstring TEXT, the round-≤3 phantom-chunk divergence). A
    # prefix-sum of per-line marker counts is exact for the dominant
    # docstring shape; a line mixing both quote styles to open one
    # string inside the other remains out of envelope (pinned in
    # tests/test_ast_divergence.py).
    trip_marks = F.size(F.split(F.col("line"), "'''|\"\"\"")) - 1
    in_string = (
        F.coalesce(
            F.sum(trip_marks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        % 2
        == 1
    )
    flagged = lines.withColumn(
        "chunk_no",
        F.sum(
            F.when(F.col("line").rlike(HIER_BOUNDARY_RE) & ~in_string, 1).otherwise(0)
        ).over(w),
    )
    sorted_lines = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "line"))),
        lambda s: s.getField("line"),
    )
    grouped = flagged.groupBy("doc_id", "chunk_no").agg(
        F.min_by("line", "pos").alias("_first"),
        F.count("*").alias("n_lines"),
        sorted_lines.alias("_lines"),
    )
    first_stripped = F.regexp_replace("_first", r"^[ \t]+", "")
    indent = F.length("_first") - F.length(first_stripped)
    is_def = first_stripped.rlike(r"^(async )?def ")
    # opener kind straight from the boundary line; the final
    # method-vs-function decision needs the nearest-ancestor kind and
    # happens after the indent-stack fold below
    pre_type = (
        F.when(F.col("chunk_no") == 0, "module")
        .when(first_stripped.startswith("class "), "class")
        .when(is_def, "def")
        .otherwise("module")
    )
    # longest suffix of this chunk's lines that are decorator lines —
    # they decorate the NEXT chunk (attached below via lag)
    trail_dec = F.reverse(
        F.aggregate(
            F.reverse("_lines"),
            F.struct(
                F.lit(True).alias("take"),
                F.array().cast("array<string>").alias("dec"),
            ),
            lambda acc, x: F.struct(
                (acc.getField("take") & x.rlike(DECORATOR_RE)).alias("take"),
                F.when(
                    acc.getField("take") & x.rlike(DECORATOR_RE),
                    F.concat(
                        acc.getField("dec"),
                        F.array(F.regexp_replace(x, r"^[ \t]+", "")),
                    ),
                ).otherwise(acc.getField("dec")).alias("dec"),
            ),
        ).getField("dec")
    )
    # Collapse the (possibly multi-line) signature into one line: fold
    # the chunk's lines, accumulating until the paren balance closes on
    # a header that saw a '(' (or a ':' line for paren-less `class A:`).
    # Recovers full params/return_type for signatures spanning lines —
    # the largest divergence from real AST parsing in rounds ≤3.
    def _sig_step(acc, x):
        stripped_x = F.trim(x)
        opens = F.length(x) - F.length(F.regexp_replace(x, r"\(", ""))
        closes = F.length(x) - F.length(F.regexp_replace(x, r"\)", ""))
        take = acc.getField("act")
        bal2 = acc.getField("bal") + opens - closes
        seen2 = acc.getField("seen") | (opens > 0)
        sig2 = F.when(
            take,
            F.when(acc.getField("sig") == "", stripped_x).otherwise(
                F.concat(acc.getField("sig"), F.lit(" "), stripped_x)
            ),
        ).otherwise(acc.getField("sig"))
        done = (bal2 <= 0) & (seen2 | stripped_x.endswith(":"))
        return F.struct(
            (take & ~done).alias("act"),
            F.when(take, bal2).otherwise(acc.getField("bal")).alias("bal"),
            F.when(take, seen2).otherwise(acc.getField("seen")).alias("seen"),
            sig2.alias("sig"),
        )

    sig_line = F.aggregate(
        "_lines",
        F.struct(
            F.lit(True).alias("act"),
            F.lit(0).alias("bal"),
            F.lit(False).alias("seen"),
            F.lit("").alias("sig"),
        ),
        _sig_step,
    ).getField("sig")
    # params substring: greedy up to the ')' that precedes '->' (when a
    # return annotation exists) or the final '):' — nested parens in
    # defaults stay inside the capture
    has_ret = sig_line.rlike(r"->\s*[^:]+:")
    params_raw = F.when(
        has_ret, F.regexp_extract(sig_line, r"\((.*)\)\s*->\s*[^:]+:", 1)
    ).otherwise(F.regexp_extract(sig_line, r"\((.*)\)\s*:", 1))

    # balance-aware comma split: `x=(1, 2)` / `y=[1, 2]` stay single
    # params (a naive split(',') breaks them — AST-parity fixture)
    def _split_step(acc, t):
        opens = F.length(t) - F.length(F.regexp_replace(t, r"[(\[{]", ""))
        closes = F.length(t) - F.length(F.regexp_replace(t, r"[)\]}]", ""))
        cur2 = F.when(acc.getField("cur") == "", t).otherwise(
            F.concat(acc.getField("cur"), F.lit(","), t)
        )
        bal2 = acc.getField("bal") + opens - closes
        flush = bal2 <= 0
        return F.struct(
            F.when(flush, F.concat(acc.getField("parts"), F.array(F.trim(cur2))))
            .otherwise(acc.getField("parts"))
            .alias("parts"),
            F.when(flush, F.lit("")).otherwise(cur2).alias("cur"),
            F.when(flush, F.lit(0)).otherwise(bal2).alias("bal"),
        )

    params = F.when(
        is_def,
        F.aggregate(
            F.split(params_raw, ","),
            F.struct(
                F.array().cast("array<string>").alias("parts"),
                F.lit("").alias("cur"),
                F.lit(0).alias("bal"),
            ),
            _split_step,
            lambda acc: F.filter(
                F.concat(acc.getField("parts"), F.array(F.trim(acc.getField("cur")))),
                lambda p: p != "",
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return_type = F.when(
        is_def, F.trim(F.regexp_extract(sig_line, r"->\s*([^:]+):", 1))
    ).otherwise(F.lit(""))

    typed = grouped.select(
        "doc_id",
        "chunk_no",
        indent.alias("_indent"),
        pre_type.alias("_pre_type"),
        F.regexp_extract(first_stripped, HIER_NAME_RE, 1).alias("name"),
        trail_dec.alias("_trail_dec"),
        params.alias("params"),
        return_type.alias("return_type"),
        "n_lines",
        F.array_join("_lines", "\n").alias("chunk_text"),
    )
    wc = Window.partitionBy("doc_id").orderBy("chunk_no")
    # True nesting (round 4 — tree-sitter emits full depth + the REAL
    # enclosing scope as parent): walk the preceding chunks nearest-
    # first keeping a monotonic indent stack — each strictly-smaller
    # indent is one enclosing scope. depth = stack size, parent = the
    # nearest scope, parent kind decides method (class scope) vs
    # function (def scope / nested closure). The collected prefix is
    # O(chunks-per-file) per row — bounded by file size, never global.
    prevs = F.collect_list(
        F.struct("chunk_no", "_indent", "name", "_pre_type")
    ).over(wc.rowsBetween(Window.unboundedPreceding, -1))

    def _stack_step(acc, s):
        is_anc = (s.getField("_pre_type") != "module") & (
            s.getField("_indent") < acc.getField("min")
        )
        return F.struct(
            F.when(is_anc, s.getField("_indent")).otherwise(acc.getField("min")).alias("min"),
            F.when(is_anc, acc.getField("depth") + 1).otherwise(acc.getField("depth")).alias("depth"),
            F.coalesce(
                acc.getField("parent"), F.when(is_anc, s.getField("name"))
            ).alias("parent"),
            F.coalesce(
                acc.getField("ptype"), F.when(is_anc, s.getField("_pre_type"))
            ).alias("ptype"),
        )

    anc = F.aggregate(
        F.reverse(prevs),
        F.struct(
            F.col("_indent").alias("min"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("string").alias("parent"),
            F.lit(None).cast("string").alias("ptype"),
        ),
        _stack_step,
    )
    chunk_type = (
        F.when(F.col("_pre_type") == "module", "module")
        .when(F.col("_pre_type") == "class", "class")
        .when(anc.getField("ptype") == "class", "method")
        .otherwise("function")
    )
    return typed.select(
        "doc_id",
        "chunk_no",
        anc.getField("depth").alias("depth"),
        chunk_type.alias("chunk_type"),
        "name",
        anc.getField("parent").alias("parent"),
        F.coalesce(F.lag("_trail_dec").over(wc), F.array().cast("array<string>")).alias(
            "decorators"
        ),
        "params",
        "return_type",
        "n_lines",
        "chunk_text",
    )


def complexity_metrics(
    chunks: DataFrame,
    branch_keywords: list[str],
    id_cols: list[str],
    text_col: str = "chunk_text",
) -> DataFrame:
    """A3 per-chunk complexity (reference collectors,
    ``analysis/collectors/complexity.py:221-744``): cyclomatic = 1 +
    branch-keyword count, plus token count — pure array expressions,
    no AST needed for the metric shape."""
    from mcp_vector_search_spark.functions.text import tokenize

    toks = tokenize(text_col)
    branch_count = F.size(F.filter(toks, lambda t: t.isin(branch_keywords)))
    return chunks.select(
        *id_cols,
        (F.lit(1) + branch_count).cast("long").alias("cyclomatic"),
        F.size(toks).cast("long").alias("token_count"),
    )


def boundary_flag(line_col, language_col):
    """Per-row chunk-boundary predicate for a mixed-language corpus:
    a foldable-pattern `rlike` branch per registered language (13
    branches, whole-stage-codegen friendly), dispatched on the file's
    language column — the §2.11 parser-plugin registry as one column
    expression. Unknown languages fall back to the text spec."""
    from mcp_vector_search_spark.sources.parser_registry import (
        for_language,
        registered_languages,
    )

    expr = None
    fallback = for_language("text").boundary_re
    for lang in registered_languages():
        spec = for_language(lang)
        cond = language_col == lang
        branch = line_col.rlike(spec.boundary_re)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(line_col.rlike(fallback))


def code_chunks_multilang(
    sources: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    language_col: str = "language",
) -> DataFrame:
    """`code_chunks` for a corpus spanning the registered languages —
    same running-sum window, boundary dispatched per row."""
    lines = sources.select(
        F.col(id_col).alias("doc_id"),
        F.col(language_col).alias("_lang"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = lines.withColumn(
        "chunk_no",
        F.sum(
            F.when(boundary_flag(F.col("line"), F.col("_lang")), 1).otherwise(0)
        ).over(w),
    )
    grouped = flagged.groupBy("doc_id", "_lang", "chunk_no").agg(
        F.count("*").alias("n_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("chunk_text"),
    )
    first = F.substring_index("chunk_text", "\n", 1)
    return grouped.select(
        "doc_id",
        # the language is a grouping key — emit it so consumers (the
        # ml_chunks gate) don't have to re-derive it (r6 review)
        F.col("_lang").alias("language"),
        "chunk_no",
        "n_lines",
        "chunk_text",
        # chunk 0 is always genuine preamble (a boundary first line
        # starts chunk 1), so type it 'module' like code_chunks does —
        # running kind rules on an arbitrary preamble line mislabeled
        # e.g. a '/** Returns Foo(bar). */' javadoc as a method named
        # Foo, polluting chunk-type boosts downstream (r6 review #6)
        F.when(F.col("chunk_no") == 0, F.lit("module"))
        .otherwise(kind_flag(first, F.col("_lang")))
        .alias("chunk_type"),
        F.when(F.col("chunk_no") == 0, F.lit(""))
        .otherwise(name_flag(first, F.col("_lang")))
        .alias("name"),
    )


def kind_flag(first_line_col, language_col):
    """Chunk TYPE from a chunk's first line (r6): each language's
    ordered `kind_rules` as a first-match-wins when-chain — the
    reference's chunk_type surface (struct/interface/method/... ,
    ``parsers/base.py`` ChunkInfo) for the whole mixed-language corpus
    in one column expression. Untyped boundaries → 'chunk'."""
    from mcp_vector_search_spark.sources.parser_registry import (
        for_language,
        registered_languages,
    )

    expr = None
    for lang in registered_languages():
        rules = for_language(lang).kind_rules
        if not rules:
            continue
        per_lang = None
        for kind, pat in rules:
            cond_rule = first_line_col.rlike(pat)
            per_lang = (
                F.when(cond_rule, F.lit(kind))
                if per_lang is None
                else per_lang.when(cond_rule, F.lit(kind))
            )
        per_lang = per_lang.otherwise(F.lit("chunk"))
        cond = language_col == lang
        expr = (
            F.when(cond, per_lang) if expr is None else expr.when(cond, per_lang)
        )
    return expr.otherwise(F.lit("chunk"))


def name_flag(first_line_col, language_col):
    """Chunk NAME (group 1 of the first matching kind rule) — the
    reference's function_name/class_name surface; null when no rule
    matches."""
    from mcp_vector_search_spark.sources.parser_registry import (
        for_language,
        registered_languages,
    )

    expr = None
    for lang in registered_languages():
        rules = for_language(lang).kind_rules
        if not rules:
            continue
        per_lang = None
        for _, pat in rules:
            cond_rule = first_line_col.rlike(pat)
            val = F.nullif(F.regexp_extract(first_line_col, pat, 1), F.lit(""))
            per_lang = (
                F.when(cond_rule, val)
                if per_lang is None
                else per_lang.when(cond_rule, val)
            )
        per_lang = per_lang.otherwise(F.lit(None).cast("string"))
        cond = language_col == lang
        expr = (
            F.when(cond, per_lang) if expr is None else expr.when(cond, per_lang)
        )
    return expr.otherwise(F.lit(None).cast("string"))


# Halstead metrics (reference ``analysis/collectors/halstead.py:37-140``
# + the halstead_* columns of ``analysis/metrics.py:36-40``). The
# reference counts AST operator/operand nodes; the text analog counts
# the same lexical classes — keyword + symbol operators, identifier +
# number operands — with one regex pass each, so the whole metric set
# stays per-row column math (oracle-portable, zero shuffle).
HALSTEAD_KEYWORDS = [
    "def", "return", "if", "else", "elif", "for", "while", "in",
    "and", "or", "not", "class", "import", "from", "try", "except",
    "lambda", "yield", "with", "as", "pass", "break", "continue",
    "raise", "assert", "is",
]
IDENT_RE = "[A-Za-z_][A-Za-z0-9_]*"
NUMBER_RE = r"\b[0-9]+(?:\.[0-9]+)?\b"
SYMBOL_OP_RE = r"[+\-*/%=<>!&|^~]+|[()\[\]{}:,;.]"


def halstead_metrics(
    chunks: DataFrame,
    id_cols: list[str],
    text_col: str = "chunk_text",
) -> DataFrame:
    """Per-chunk Halstead suite: n1/n2/N1/N2 and the derived
    vocabulary, length, volume = N·log2(n), difficulty =
    (n1/2)·(N2/n2), effort = D·V, time = E/18 s, bugs = V/3000 —
    the exact formula set of ``HalsteadMetrics.from_counts``.
    Zero-vocabulary (or zero-operand) chunks report 0 for every
    derived metric, mirroring the reference's guard."""
    col = F.col(text_col)
    idents = F.regexp_extract_all(col, F.lit(IDENT_RE), 0)
    kw = F.array(*[F.lit(k) for k in HALSTEAD_KEYWORDS])
    kw_ops = F.filter(idents, lambda t: F.array_contains(kw, t))
    operands_id = F.filter(idents, lambda t: ~F.array_contains(kw, t))
    numbers = F.regexp_extract_all(col, F.lit(NUMBER_RE), 0)
    sym_ops = F.regexp_extract_all(col, F.lit(SYMBOL_OP_RE), 0)

    operators = F.concat(kw_ops, sym_ops)
    operands = F.concat(operands_id, numbers)
    n1 = F.size(F.array_distinct(operators)).cast("long")
    n2 = F.size(F.array_distinct(operands)).cast("long")
    N1 = F.size(operators).cast("long")
    N2 = F.size(operands).cast("long")
    vocab = n1 + n2
    length = N1 + N2
    ok = (vocab > 0) & (length > 0)
    volume = F.when(ok, length.cast("double") * F.log2(vocab.cast("double"))).otherwise(0.0)
    difficulty = F.when(
        ok & (n2 > 0),
        n1.cast("double") / 2.0 * (N2.cast("double") / n2.cast("double")),
    ).otherwise(0.0)
    effort = difficulty * volume
    return chunks.select(
        *id_cols,
        n1.alias("n1"),
        n2.alias("n2"),
        N1.alias("total_operators"),
        N2.alias("total_operands"),
        vocab.alias("vocabulary"),
        length.alias("length"),
        F.round(volume, 6).alias("volume"),
        F.round(difficulty, 6).alias("difficulty"),
        F.round(effort, 6).alias("effort"),
        F.round(effort / 18.0, 6).alias("time_seconds"),
        F.round(volume / 3000.0, 6).alias("estimated_bugs"),
    )
