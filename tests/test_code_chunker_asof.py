from __future__ import annotations

import datetime as dt

from mcp_vector_search_spark.operators.cohesion import _lcom4, lcom4
from mcp_vector_search_spark.operators.events import asof_join
from mcp_vector_search_spark.sources.code_chunker import code_chunks, complexity_metrics


def test_code_chunks_structure(spark):
    src = "import os\n\ndef foo():\n  x = 1\n\nclass Bar:\n  pass"
    df = spark.createDataFrame([(1, src)], "doc_id long, text string")
    got = {
        (r.chunk_no): (r.chunk_type, r.name, r.n_lines)
        for r in code_chunks(df).collect()
    }
    assert got[0] == ("module", "", 2)       # import + blank line
    assert got[1] == ("function", "foo", 3)  # def + body + blank
    assert got[2] == ("class", "Bar", 2)


def test_complexity_metrics(spark):
    df = spark.createDataFrame(
        [(1, 0, "if x join y filter z join w")], "doc_id long, chunk_no int, chunk_text string"
    )
    got = complexity_metrics(df, ["join", "filter"], ["doc_id", "chunk_no"]).first()
    assert got.cyclomatic == 4 and got.token_count == 8  # 1 + 2 joins + 1 filter


def test_lcom4_components():
    # m1,m2 share attr a; m3 uses b alone; m4 touches nothing → 3 components
    edges = [("m1", "a"), ("m2", "a"), ("m3", "b"), ("m4", "")]
    assert _lcom4(edges) == 3


def test_lcom4_spark(spark):
    rows = [("C", "m1", "a"), ("C", "m2", "a"), ("C", "m3", "b"), ("D", "x", None)]
    df = spark.createDataFrame(rows, "class_name string, method string, attr string")
    got = {r.class_name: (r.lcom4, r.n_methods) for r in lcom4(df).collect()}
    assert got == {"C": (2, 3), "D": (1, 1)}


def test_asof_join_semantics(spark):
    t = dt.datetime
    events = spark.createDataFrame(
        [
            (1, t(2024, 1, 1), 7),
            (2, t(2024, 1, 10), 7),
            (3, t(2024, 1, 10), 7),   # tie on ts → larger event_id wins
            (4, t(2024, 1, 20), 8),
        ],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    probes = spark.createDataFrame(
        [(7, t(2024, 1, 10)), (7, t(2024, 1, 5)), (8, t(2024, 1, 1))],
        "user_id long, pt timestamp_ntz",
    )
    got = {
        (r.user_id, r.pt): r.last_event_id
        for r in asof_join(probes, events).collect()
    }
    assert got[(7, t(2024, 1, 10))] == 3  # inclusive + tie-break to max id
    assert got[(7, t(2024, 1, 5))] == 1
    assert got[(8, t(2024, 1, 1))] is None  # no event yet