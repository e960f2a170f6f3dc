"""§2.11 language parser plugin registry (reference
``parsers/registry.py``: a dict keyed by file extension mapping to a
parser class; 13 languages).

Here a "parser" is a declarative chunking spec — the boundary regex
and branch keywords the chunk/complexity operators consume. Because
the spec is data (not code), the whole multi-language corpus chunks
in ONE Spark job: join the per-file language onto the spec table
(broadcast — it has a dozen rows) and the boundary match becomes a
single `rlike` against the language's pattern column. Registering a
language is one dict entry, exactly the reference's plugin shape.

tree-sitter itself is a native dependency not present in this
container; the regex boundary spec is the documented fallback
analog (reference ``parsers/base.py:301-386`` fallback chunker).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LanguageSpec:
    language: str
    extensions: tuple[str, ...]
    boundary_re: str  # line pattern that starts a new chunk
    branch_keywords: tuple[str, ...] = field(
        default=("if", "elif", "else", "for", "while", "case", "catch", "and", "or")
    )


_SPECS: dict[str, LanguageSpec] = {}


def register(spec: LanguageSpec) -> None:
    _SPECS[spec.language] = spec


def for_language(language: str) -> LanguageSpec:
    return _SPECS.get(language, _SPECS["text"])


def for_extension(ext: str) -> LanguageSpec:
    e = ext.lower().lstrip(".")
    for spec in _SPECS.values():
        if e in spec.extensions:
            return spec
    return _SPECS["text"]


def registered_languages() -> list[str]:
    return sorted(_SPECS)


def spec_rows() -> list[tuple[str, str]]:
    """(language, boundary_re) rows — broadcast-join this against a
    files frame to chunk a mixed-language corpus in one pass."""
    return [(s.language, s.boundary_re) for s in _SPECS.values()]


for _spec in [
    LanguageSpec("python", ("py", "pyi"), r"^(def |class |async def )"),
    LanguageSpec(
        "javascript",
        ("js", "jsx", "mjs"),
        r"^(function |class |const \w+ = (async )?\(|export (default )?(function|class) )",
    ),
    LanguageSpec(
        "typescript",
        ("ts", "tsx"),
        r"^(function |class |interface |type \w+ =|const \w+ = (async )?\(|export )",
    ),
    LanguageSpec("go", ("go",), r"^(func |type \w+ (struct|interface))"),
    LanguageSpec("java", ("java",), r"^\s*(public |private |protected ).*[({]$"),
    LanguageSpec("rust", ("rs",), r"^(pub )?(fn |struct |enum |impl |trait |mod )"),
    LanguageSpec("c", ("c", "h"), r"^\w[\w\s\*]*\([^;]*$"),
    LanguageSpec("cpp", ("cpp", "cc", "hpp", "cxx"), r"^[\w:<>~][\w\s\*:<>,&~]*\([^;]*$"),
    LanguageSpec("ruby", ("rb",), r"^\s*(def |class |module )"),
    LanguageSpec("php", ("php",), r"^\s*(function |class |trait )"),
    LanguageSpec("swift", ("swift",), r"^\s*(func |class |struct |enum |extension )"),
    LanguageSpec("kotlin", ("kt", "kts"), r"^\s*(fun |class |object |interface )"),
    LanguageSpec("text", ("txt", "md", "rst"), r"^#{1,6} |^={3,}$"),
]:
    register(_spec)
