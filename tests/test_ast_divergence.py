"""Adversarial fixtures where the regex boundary chunker is KNOWN to
diverge from real tree-sitter AST parsing (VERDICT r3 Missing #1).

Each test pins the CURRENT behavior so the divergence envelope is
executable documentation, not folklore. Summary (also in COVERAGE.md):

| case                              | tree-sitter          | this repo             |
|-----------------------------------|----------------------|-----------------------|
| multiline signature params        | full param list      | full param list (r4:  |
|                                   |                      | balance-fold — parity)|
| `def` at col 0 inside docstring   | no chunk             | no chunk (r4: quote-  |
|                                   |                      | parity — parity)      |
| mixed ''' / \"\"\" on one line    | tracks real nesting  | marker-count parity   |
|                                   |                      | can mis-suppress      |
| decorated nested (depth≥2) def    | own node, true depth | own node, true depth  |
|                                   |                      | (r4: indent stack)    |
| conditional C macro function      | ifdef-aware          | both branches chunked |
| one-line `def f(): return x`      | body captured        | same chunk, works     |
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _chunks(spark, src: str):
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_hierarchical,
    )

    df = spark.createDataFrame([(1, src)], "doc_id long, text string")
    return code_chunks_hierarchical(df).orderBy("chunk_no").collect()


def test_multiline_signature_params_recovered(spark):
    """Round ≤3 divergence, CLOSED in round 4: the signature is folded
    across lines until its paren balance closes, so multi-line
    signatures now parse to the same param list / return type the AST
    gives. Kept here (not in test_ast_parity) as the record of the
    envelope shrinking."""
    src = (
        "def long_sig(\n"
        "    first: int,\n"
        "    second: str = 'x',\n"
        ") -> bool:\n"
        "    return True\n"
        "\n"
        "def short_sig(a: int) -> int:\n"
        "    return a\n"
    )
    rows = {r.name: r for r in _chunks(spark, src) if r.name}
    assert set(rows) == {"long_sig", "short_sig"}  # boundaries: parity
    assert rows["long_sig"].params == ["first: int", "second: str = 'x'"]
    assert rows["long_sig"].return_type == "bool"
    assert rows["short_sig"].params == ["a: int"]  # single-line: parity
    assert rows["short_sig"].return_type == "int"


def test_nested_paren_defaults_stay_one_param(spark):
    """`x=(1, 2)` / `y=[1, 2]` must not split at their inner commas —
    the balance-aware split matches the AST param boundaries."""
    src = (
        "def f(x=(1, 2), y=[3, 4], z={'a': 1}, w: int = 5) -> dict:\n"
        "    return {}\n"
    )
    rows = {r.name: r for r in _chunks(spark, src) if r.name}
    assert rows["f"].params == [
        "x=(1, 2)", "y=[3, 4]", "z={'a': 1}", "w: int = 5"
    ]
    assert rows["f"].return_type == "dict"


def test_docstring_def_suppressed_by_quote_parity(spark):
    """Round ≤3 divergence, CLOSED in round 4: a 'def ' line inside a
    triple-quoted string is suppressed by the quote-parity prefix sum
    — no phantom chunk, matching the AST view."""
    src = (
        "DOC = '''usage:\n"
        "def not_code(x):\n"
        "    pass\n"
        "'''\n"
        "def real(x):\n"
        "    return x\n"
    )
    names = [r.name for r in _chunks(spark, src) if r.name]
    assert names == ["real"]  # parity: the docstring def is text


def test_mixed_quote_styles_remain_out_of_envelope(spark):
    """Still-open divergence, pinned: a line opening a '''-string
    whose body contains an unmatched \"\"\" flips the parity counter,
    so the def AFTER the string is wrongly suppressed. Tree-sitter
    tracks real string nesting; the prefix-sum model counts markers."""
    src = (
        "DOC = '''one \"\"\" inside'''\n"
        "def after(x):\n"
        "    return x\n"
    )
    names = [r.name for r in _chunks(spark, src) if r.name]
    # tree-sitter: ['after']; marker parity sees 3 marks → odd → the
    # def is swallowed into the module chunk
    assert names == []  # DIVERGES: suppressed by mixed-style count


def test_decorated_deeply_nested_def_true_nesting(spark):
    """Round ≤3 divergence, CLOSED in round 4: the monotonic indent
    stack recovers TRUE depth and the real enclosing scope, so a
    decorated method of a nested class reports depth 2 with parent
    Inner — the AST view."""
    src = (
        "class Outer:\n"
        "    class Inner:\n"
        "        @cached\n"
        "        def deep(self):\n"
        "            return 1\n"
        "    def shallow(self):\n"
        "        return 2\n"
    )
    rows = _chunks(spark, src)
    deep = next(r for r in rows if r.name == "deep")
    assert deep.depth == 2 and deep.parent == "Inner"  # parity
    assert deep.chunk_type == "method"
    assert deep.decorators == ["@cached"]  # decorator attach: parity
    shallow = next(r for r in rows if r.name == "shallow")
    assert shallow.depth == 1 and shallow.parent == "Outer"
    inner = next(r for r in rows if r.name == "Inner")
    assert inner.depth == 1 and inner.parent == "Outer"


def test_nested_closure_is_function_not_method(spark):
    """A def nested inside a def is a FUNCTION (closure) with the
    enclosing function as parent — the enclosing-scope-kind rule,
    matching tree-sitter's node types."""
    src = (
        "def outer():\n"
        "    def inner():\n"
        "        return 1\n"
        "    return inner\n"
    )
    rows = _chunks(spark, src)
    inner = next(r for r in rows if r.name == "inner")
    assert inner.chunk_type == "function"  # NOT method
    assert inner.parent == "outer" and inner.depth == 1


def test_c_macro_conditional_functions_both_chunked(spark):
    """C sources guarded by #ifdef produce ONE function after the
    preprocessor; the spec-based chunker sees both branches' openers.
    Pinned: both chunks appear (the over-report direction, never
    silent loss)."""
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_multilang,
    )

    src = (
        "#ifdef FAST\n"
        "int work(int x) {\n"
        "    return x * 2;\n"
        "}\n"
        "#else\n"
        "int work(int x) {\n"
        "    return slow(x);\n"
        "}\n"
        "#endif\n"
    )
    df = spark.createDataFrame(
        [(1, src, "c")], "doc_id long, text string, language string"
    )
    rows = code_chunks_multilang(df).collect()
    # tree-sitter-with-preprocessor view: 1 function; regex view: 2
    n_func_chunks = sum(1 for r in rows if "work" in (r.chunk_text or ""))
    assert n_func_chunks >= 2  # DIVERGES: both ifdef branches chunked


def test_one_line_def_keeps_body_in_chunk(spark):
    """`def f(): return x` on one line: boundary, name, params, and
    body all land in the same chunk — parity with AST for this form."""
    src = "def f(a, b): return a + b\nprint(f(1, 2))\n"
    rows = {r.name: r for r in _chunks(spark, src) if r.name}
    assert rows["f"].params == ["a", "b"]
    assert "return a + b" in rows["f"].chunk_text
