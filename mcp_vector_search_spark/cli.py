"""argv front-end over the MCP tool adapter — the reference's other
UX (Typer CLI, ``cli/main.py:234-341``) reduced to its engine core:
`<tool> [--arg value ...]` dispatches through the same `call_tool`
surface the MCP adapter exposes and prints one JSON document.

    python -m mcp_vector_search_spark.cli --sf-dir /data/sf0.01 \
        search_code --query "parse chunk" --limit 5
    python -m mcp_vector_search_spark.cli list-tools

Unknown --args are passed through as strings (each tool validates its
own contract); values that look like ints or floats are coerced.
Prefix a value with ``str:`` to force it through as a string — the
escape hatch for numeric-looking strings (all-digit commit shas,
numeric search queries): ``--commit-sha str:4213458``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _coerce(v: str):
    import re

    if v.startswith("str:"):  # forced string, e.g. an all-digit sha
        return v[4:]
    if v.lower() in ("true", "false"):  # '--force false' must DISABLE
        return v.lower() == "true"
    if re.fullmatch(r"-?\d+", v):
        return int(v)
    # strict decimal shape only: Python's float() also accepts 'nan',
    # 'inf', 'infinity' and underscore forms ('1_000'), which would
    # turn e.g. '--query infinity' into float('inf') and break the
    # tool's string contract (ADVICE r4)
    if re.fullmatch(r"-?\d+\.\d+", v):
        return float(v)
    return v


def main(argv: list[str] | None = None, adapter=None) -> int:
    parser = argparse.ArgumentParser(prog="mcp-vector-search-spark")
    parser.add_argument("--sf-dir", default=None, help="directory with documents/embeddings parquet")
    parser.add_argument("--repo-path", default=None, help="git repo for temporal tools")
    parser.add_argument("--max-rows", type=int, default=200)
    parser.add_argument("tool", help="tool name, or list-tools")
    ns, extra = parser.parse_known_args(argv)

    # --key value pairs → arguments dict
    args: dict = {}
    i = 0
    while i < len(extra):
        tok = extra[i]
        if not tok.startswith("--"):
            print(json.dumps({"ok": False, "error": f"unexpected argument {tok!r}"}))
            return 2
        key = tok[2:].replace("-", "_")
        # 'str:' must work during POSITION detection too: a value that
        # itself starts with '--' (e.g. --query "str:--version notes")
        # was misparsed as the next flag and silently dropped
        # (r6 review #6)
        if i + 1 < len(extra) and (
            extra[i + 1].startswith("str:") or not extra[i + 1].startswith("--")
        ):
            args[key] = _coerce(extra[i + 1])
            i += 2
        else:
            args[key] = True
            i += 1

    if ns.tool == "list-tools":
        from mcp_vector_search_spark.mcp_adapter import list_tools

        print(json.dumps(list_tools(), indent=2))
        return 0

    if adapter is None:
        if ns.sf_dir is None:
            print(json.dumps({"ok": False, "error": "--sf-dir is required"}))
            return 2
        from mcp_vector_search_spark import io
        from mcp_vector_search_spark.api import SparkProject
        from mcp_vector_search_spark.mcp_adapter import McpAdapter
        from mcp_vector_search_spark.session import get_spark

        spark = get_spark(app_name="mcp-vector-search-spark-cli")
        adapter = McpAdapter(
            SparkProject(
                spark,
                io.table(spark, ns.sf_dir, "documents"),
                io.table(spark, ns.sf_dir, "embeddings"),
            ),
            repo_path=ns.repo_path,
            max_rows=ns.max_rows,
        )

    result = adapter.call_tool(ns.tool, args)
    print(json.dumps(result))
    return 0 if result.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
