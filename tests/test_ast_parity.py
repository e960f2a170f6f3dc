"""Golden parity tests against the reference engine's own AST fixtures
(``/root/reference/tests/sample_code/ast_test_*.py|js|ts`` — read-only
test INPUTS; the expectations below are derived from what the
reference's tree-sitter parsers extract, ``parsers/python.py`` +
``parsers/base.py:24-298``).

Parity matrix for the relational (regex-boundary) chunk model vs the
reference's tree-sitter AST:

| AST feature                      | parity                           |
|----------------------------------|----------------------------------|
| module/class/function chunks     | FULL (names, order, types)       |
| class → method hierarchy         | FULL (depth + parent link)       |
| decorator extraction             | FULL for line-form `@deco`       |
| params w/ type annotations       | single-line signatures only      |
| return-type annotation           | single-line signatures only      |
| multi-line signatures            | name/boundary YES, params NO     |
| nested closures (depth ≥ 2)      | stay inside parent chunk         |
| docstring extraction             | not separated (in chunk_text)    |
"""

from __future__ import annotations

import os

import pytest

FIXTURES = "/root/reference/tests/sample_code"


def _fixture(name: str) -> str:
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    with open(path) as f:
        return f.read()


def _py_chunks(spark):
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_hierarchical,
    )

    src = spark.createDataFrame(
        [(1, _fixture("ast_test_python.py"))], "doc_id long, text string"
    )
    return {r.name: r for r in code_chunks_hierarchical(src).collect() if r.name}


def test_python_fixture_chunk_inventory(spark):
    """Every def/class the reference parser extracts appears, with the
    right type and hierarchy."""
    chunks = _py_chunks(spark)
    top_functions = {"simple_function", "calculate_grade", "complex_validator"}
    classes = {"User", "AuthenticationManager"}
    user_methods = {
        "__post_init__",
        "display_name",
        "is_adult",
        "validate_email",
        "from_dict",
        "update_profile",
    }
    auth_methods = {
        "__init__",
        "authenticate",
        "_validate_credentials",
        "_generate_token",
    }
    assert top_functions <= set(chunks)
    assert classes <= set(chunks)
    assert user_methods <= set(chunks)
    assert auth_methods <= set(chunks)
    for n in top_functions:
        assert chunks[n].chunk_type == "function" and chunks[n].depth == 0
        assert chunks[n].parent is None
    for n in classes:
        assert chunks[n].chunk_type == "class" and chunks[n].depth == 0
    for n in user_methods:
        assert chunks[n].chunk_type == "method"
        assert chunks[n].parent == "User", n
    for n in auth_methods:
        assert chunks[n].parent == "AuthenticationManager", n


def test_python_fixture_decorators(spark):
    """Decorator extraction parity (@property/@staticmethod/
    @classmethod/@dataclass — reference parser's decorator feature)."""
    chunks = _py_chunks(spark)
    assert chunks["display_name"].decorators == ["@property"]
    assert chunks["is_adult"].decorators == ["@property"]
    assert chunks["validate_email"].decorators == ["@staticmethod"]
    assert chunks["from_dict"].decorators == ["@classmethod"]
    assert chunks["User"].decorators == ["@dataclass"]
    assert chunks["simple_function"].decorators == []


def test_python_fixture_signatures(spark):
    """Param + return-type parity for single-line AND multi-line
    signatures (the latter recovered by the round-4 balance fold)."""
    chunks = _py_chunks(spark)
    assert chunks["simple_function"].params == ["name: str"]
    assert chunks["simple_function"].return_type == "str"
    assert chunks["calculate_grade"].params == ["score: int", "bonus: int = 0"]
    assert chunks["is_adult"].return_type == "bool"
    assert chunks["validate_email"].params == ["email: str"]
    # multi-line signature: folded across lines (round 4) — full
    # param/return parity with the AST view of the same fixture
    assert chunks["update_profile"].params == [
        "self",
        "name: str | None = None",
        "age: int | None = None",
        "email: str | None = None",
    ]
    assert chunks["update_profile"].return_type == "None"
    assert chunks["update_profile"].chunk_type == "method"


def test_javascript_fixture_multilang_boundaries(spark):
    """JS fixture through the multilang boundary-spec chunker: every
    top-level function / arrow-function / class the reference parser
    extracts starts a chunk (methods stay inside their class — the
    documented js fallback shape)."""
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_multilang,
    )

    src = spark.createDataFrame(
        [(1, _fixture("ast_test_javascript.js"), "javascript")],
        "doc_id long, text string, language string",
    )
    chunks = code_chunks_multilang(src).collect()
    firsts = [c.chunk_text.split("\n")[0] for c in chunks if c.chunk_no > 0]
    for expected in [
        "function simpleGreeting(name) {",
        "function calculateGrade(score, bonus = 0) {",
        "function complexValidator(data) {",
        "const doubleNumber = (x) => x * 2;",
        "const processNumbers = (numbers) => {",
        "class User {",
        "class AuthenticationManager {",
    ]:
        assert any(f.startswith(expected) for f in firsts), expected


def test_typescript_fixture_multilang_boundaries(spark):
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_multilang,
    )

    text = _fixture("ast_test_typescript.ts")
    src = spark.createDataFrame(
        [(1, text, "typescript")], "doc_id long, text string, language string"
    )
    chunks = code_chunks_multilang(src).collect()
    firsts = [c.chunk_text.split("\n")[0] for c in chunks if c.chunk_no > 0]
    # every top-level interface/type/class/function line opens a chunk
    import re

    expected = [
        ln
        for ln in text.split("\n")
        if re.match(r"^(function |class |interface |type \w+ =|export )", ln)
    ]
    assert expected, "fixture unexpectedly empty"
    for ln in expected:
        assert any(f == ln for f in firsts), ln
