"""Pure-driver unit tests for bench.py's orchestration helpers — no
Spark session. The orchestrator's merge/emit path is the ONE line the
round driver parses; these pin its failure-visibility and length
contracts (r8)."""

from __future__ import annotations

import io as _io
import json
from contextlib import redirect_stdout

import bench


def _emit_capture(total, per_query):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        bench.emit_results(total, per_query)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    return json.loads(lines[0]), json.loads(lines[-1])


def test_total_of_sums_headline_and_serving_keys():
    pq = {n: 1.0 for n in bench.HEADLINE}
    pq.update({"ann_brute_q256": 2.0, "ann_ivf_q256": 3.0,
               "bm25_query_indexed": 4.0, "unrelated": 99.0})
    assert bench._total_of(pq) == len(bench.HEADLINE) + 9.0
    # missing sections (a crashed subprocess) just drop out — the
    # orchestrator makes that loud via section_*_error + exit code
    assert bench._total_of({"bm25_topk": 1.5}) == 1.5


def test_emit_results_compact_line_is_last_and_bounded():
    pq = {n: 1.234 for n in bench.HEADLINE}
    pq.update({k: 5.678 for k in bench.EXTRA_COMPACT_KEYS})
    pq["wall_total_sec"] = 100.0
    full, compact = _emit_capture(12.3, pq)
    assert full["metric"] == "headline_queries_total_wall_full"
    assert compact["metric"] == "headline_queries_total_wall"
    assert compact["value"] == 12.3
    # every extra compact key survives into the parsed line
    for k in bench.EXTRA_COMPACT_KEYS:
        assert compact["queries"][k] == 5.678
    assert len(json.dumps(compact)) < 1500


def test_emit_results_surfaces_section_errors_truncated():
    pq = {n: 1.0 for n in bench.HEADLINE}
    pq["section_ann_big_error"] = "rc=1 " + "x" * 500
    _, compact = _emit_capture(1.0, pq)
    err = compact["queries"]["section_ann_big_error"]
    assert err.startswith("rc=1") and len(err) <= 60
    assert len(json.dumps(compact)) < 1500


def test_section_registry_covers_order():
    assert set(bench.SECTION_ORDER) == set(bench.SECTIONS)
    assert bench.SECTION_ORDER[0] == "core"  # headline keys feed `value`
