"""MCP stdio server (reference mcp/server.py:303-460): JSON-RPC 2.0
framing over the tool adapter — handshake, listTools, callTool,
notifications, and error codes, driven through in-memory pipes."""

from __future__ import annotations

import io as _stdio
import json

from tests.conftest import SF_DIR
from tests.test_mcp_adapter import _adapter


def _rpc(method, msg_id=None, params=None):
    msg = {"jsonrpc": "2.0", "method": method}
    if msg_id is not None:
        msg["id"] = msg_id
    if params is not None:
        msg["params"] = params
    return msg


def test_handshake_and_tool_listing(spark):
    from mcp_vector_search_spark.mcp_server import handle_message

    ad = _adapter(spark)
    init = handle_message(ad, _rpc("initialize", 1))
    assert init["jsonrpc"] == "2.0" and init["id"] == 1
    assert init["result"]["protocolVersion"]
    assert "tools" in init["result"]["capabilities"]
    assert init["result"]["serverInfo"]["name"] == "mcp-vector-search-spark"

    # initialized notification: no response
    assert handle_message(ad, _rpc("notifications/initialized")) is None
    assert handle_message(ad, _rpc("ping", 2)) == {
        "jsonrpc": "2.0", "id": 2, "result": {}
    }

    tools = handle_message(ad, _rpc("tools/list", 3))["result"]["tools"]
    byname = {t["name"]: t for t in tools}
    assert len(byname) >= 27
    sc = byname["search_code"]
    assert sc["inputSchema"]["type"] == "object"
    assert sc["inputSchema"]["required"] == ["query"]
    assert "query" in sc["inputSchema"]["properties"]


def test_tools_call_roundtrip_and_errors(spark):
    from mcp_vector_search_spark.mcp_server import (
        INVALID_PARAMS,
        METHOD_NOT_FOUND,
        handle_message,
    )

    ad = _adapter(spark)
    resp = handle_message(
        ad, _rpc("tools/call", 4, {"name": "get_project_status", "arguments": {}})
    )
    res = resp["result"]
    assert res["isError"] is False
    payload = json.loads(res["content"][0]["text"])
    assert payload["ok"] is True and payload["rows"]

    # a failing tool keeps JSON-RPC success but flags isError (MCP
    # distinguishes protocol errors from tool errors)
    bad = handle_message(ad, _rpc("tools/call", 5, {"name": "no_such_tool"}))
    assert bad["result"]["isError"] is True

    assert (
        handle_message(ad, _rpc("tools/call", 6, {}))["error"]["code"]
        == INVALID_PARAMS
    )
    assert (
        handle_message(ad, _rpc("frobnicate", 7))["error"]["code"]
        == METHOD_NOT_FOUND
    )
    # unknown NOTIFICATION is dropped silently, not errored
    assert handle_message(ad, _rpc("frobnicate/notify")) is None


def test_serve_pumps_stdio_frames(spark):
    """End-to-end through the transport pump: a client session as
    newline-delimited frames, including a parse error and a real
    search_code call against the sf0.001 corpus."""
    from mcp_vector_search_spark.mcp_server import PARSE_ERROR, serve

    ad = _adapter(spark)
    frames = [
        json.dumps(_rpc("initialize", 1)),
        json.dumps(_rpc("notifications/initialized")),
        "{this is not json",
        json.dumps(_rpc("tools/call", 2, {
            "name": "search_code",
            "arguments": {"query": "data fast", "limit": 5},
        })),
        "",  # blank lines are skipped
        json.dumps(_rpc("tools/list", 3)),
    ]
    out = _stdio.StringIO()
    serve(ad, _stdio.StringIO("\n".join(frames) + "\n"), out)
    resps = [json.loads(ln) for ln in out.getvalue().splitlines()]
    # 4 responses: init, parse error, call, list (notification dropped)
    assert [r.get("id") for r in resps] == [1, None, 2, 3]
    assert resps[1]["error"]["code"] == PARSE_ERROR
    hits = json.loads(resps[2]["result"]["content"][0]["text"])
    assert hits["ok"] and len(hits["rows"]) <= 5 and hits["rows"]


def test_malformed_arguments_and_idless_call_do_not_kill_server(spark):
    """A non-object `arguments` yields a structured tool error (never
    an exception through the pump), and a tools/call NOTIFICATION
    (no id) is dropped without a response — JSON-RPC forbids
    answering notifications."""
    from mcp_vector_search_spark.mcp_server import handle_message

    ad = _adapter(spark)
    resp = handle_message(
        ad, _rpc("tools/call", 9, {"name": "get_project_status", "arguments": [1]})
    )
    assert resp["result"]["isError"] is True
    payload = json.loads(resp["result"]["content"][0]["text"])
    assert "arguments must be an object" in payload["error"]

    assert (
        handle_message(
            ad, _rpc("tools/call", None, {"name": "get_project_status"})
        )
        is None
    )


def test_ann_serving_regime_roundtrip(spark):
    """VERDICT r9 #4: the serving-regime facade dict and the last
    search_batch route decision round-trip over the JSON-RPC server."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark.mcp_server import handle_message

    ad = _adapter(spark)
    tools = handle_message(ad, _rpc("tools/list", 1))["result"]["tools"]
    assert "ann_serving_regime" in {t["name"] for t in tools}

    resp = handle_message(
        ad, _rpc("tools/call", 2, {"name": "ann_serving_regime", "arguments": {}})
    )
    payload = json.loads(resp["result"]["content"][0]["text"])
    assert payload["ok"] is True
    assert payload["regime"] == {"kind": None, "regime": "brute"}
    assert payload["last_route"] is None

    # with a layout and a served batch, both halves carry real state
    ad.project.build_ann_index(num_clusters=8, kind="ivf")
    q = ad.project.vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ad.project.search_batch(q, limit=3).count()
    resp = handle_message(
        ad,
        _rpc(
            "tools/call", 3,
            {"name": "ann_serving_regime", "arguments": {"batch_size": 2}},
        ),
    )
    payload = json.loads(resp["result"]["content"][0]["text"])
    assert payload["regime"]["kind"] == "ivf"
    assert payload["regime"]["regime"] in ("brute", "probe")
    assert payload["last_route"]["served"] in ("brute", "probe")
    assert payload["last_route"]["requested"] == "auto"
