"""MCP stdio server: JSON-RPC 2.0 transport over `McpAdapter`.

The reference serves its tools over the Model Context Protocol's stdio
transport (``mcp/server.py:303-460``: an MCP ``Server`` instance wired
to stdin/stdout). This module is the same surface on Spark: newline-
delimited JSON-RPC 2.0 frames in on stdin, frames out on stdout,
implementing the MCP methods a client driver actually calls:

- ``initialize``            → protocol/capability/serverInfo handshake
- ``notifications/initialized`` (notification — no response)
- ``ping``                  → {}
- ``tools/list``            → tool names + JSON-Schema input contracts
- ``tools/call``            → dispatch through `McpAdapter.call_tool`;
  results are MCP ``content`` blocks (one ``text`` block carrying the
  adapter's JSON payload), with ``isError`` mirroring the adapter's
  ``ok`` flag — the shape ``mcp/server.py`` produces from its handlers.

Everything protocol-level lives in `handle_message` (pure dict → dict,
unit-testable without pipes); `serve` is the 20-line pump. The heavy
engine state (SparkSession, chunk/KG frames) is owned by the adapter
and built lazily, so a client that only ever calls ``tools/list``
never pays for an index build.
"""

from __future__ import annotations

import json
import sys
from typing import Any, TextIO

from mcp_vector_search_spark.mcp_adapter import TOOL_SCHEMAS, McpAdapter

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "mcp-vector-search-spark", "version": "0.4.0"}

# JSON-RPC 2.0 error codes (spec section 5.1)
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602


def tool_descriptors() -> list[dict]:
    """MCP ``tools/list`` payload: every adapter tool with a JSON-Schema
    input contract derived from the shared TOOL_SCHEMAS table (the same
    table `call_tool` validates against, so list and dispatch cannot
    disagree)."""
    out = []
    for name, spec in TOOL_SCHEMAS.items():
        out.append(
            {
                "name": name,
                "description": spec.get("description", name.replace("_", " ")),
                "inputSchema": {
                    "type": "object",
                    "properties": {a: {} for a in spec["args"]},
                    "required": list(spec["required"]),
                },
            }
        )
    return out


def _result(msg_id: Any, result: dict) -> dict:
    return {"jsonrpc": "2.0", "id": msg_id, "result": result}


def _error(msg_id: Any, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": msg_id, "error": {"code": code, "message": message}}


def handle_message(adapter: McpAdapter, msg: dict) -> dict | None:
    """One JSON-RPC message → response dict, or None for notifications
    (which must not be answered, per spec)."""
    if not isinstance(msg, dict) or msg.get("jsonrpc") != "2.0":
        return _error(None, INVALID_REQUEST, "not a JSON-RPC 2.0 message")
    method = msg.get("method")
    msg_id = msg.get("id")

    # a message without an id is a notification: per JSON-RPC 2.0 it
    # MUST NOT be answered, whatever its method — drop before dispatch
    if "id" not in msg:
        return None

    if method == "initialize":
        return _result(
            msg_id,
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": SERVER_INFO,
            },
        )
    if method == "ping":
        return _result(msg_id, {})
    if method == "tools/list":
        return _result(msg_id, {"tools": tool_descriptors()})
    if method == "tools/call":
        params = msg.get("params") or {}
        name = params.get("name")
        if not isinstance(name, str):
            return _error(msg_id, INVALID_PARAMS, "params.name (string) required")
        try:
            payload = adapter.call_tool(name, params.get("arguments"))
        except Exception as e:  # last resort: one bad call ≠ dead server
            payload = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        return _result(
            msg_id,
            {
                "content": [{"type": "text", "text": json.dumps(payload)}],
                "isError": not payload.get("ok", False),
            },
        )
    return _error(msg_id, METHOD_NOT_FOUND, f"unknown method: {method}")


def serve(adapter: McpAdapter, stdin: TextIO, stdout: TextIO) -> None:
    """Pump newline-delimited JSON-RPC frames until EOF. Malformed JSON
    gets a ParseError response; everything else goes through
    `handle_message`. One frame per line in each direction (the MCP
    stdio framing)."""
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError as e:
            resp: dict | None = _error(None, PARSE_ERROR, f"parse error: {e}")
        else:
            resp = handle_message(adapter, msg)
        if resp is not None:
            stdout.write(json.dumps(resp) + "\n")
            stdout.flush()


def main(argv: list[str] | None = None) -> None:
    """``python -m mcp_vector_search_spark.mcp_server [sf_dir]`` —
    stand up a SparkSession over the parquet tables and serve MCP on
    stdio. Spark's own log chatter goes to stderr; stdout carries only
    JSON-RPC frames (the transport requirement)."""
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    from mcp_vector_search_spark import io as _io
    from mcp_vector_search_spark.api import SparkProject
    from mcp_vector_search_spark.session import get_spark

    spark = get_spark(app_name="mcp-server")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _io.table(spark, sf_dir, "documents")
    emb = _io.table(spark, sf_dir, "embeddings")
    adapter = McpAdapter(SparkProject(spark, docs, emb))
    serve(adapter, sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
