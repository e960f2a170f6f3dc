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


def test_stamp_band_outliers_directions():
    """qps rows flag LOW, seconds rows flag HIGH, in-band and
    above-band(qps)/below-band(sec) rows are left alone — replayed on
    the round's own run-5/6 populations."""
    merged = {
        # run-5 contended core: tbl depressed, ann in band
        "hybrid_scale_tbl_qps": 21.92,
        "hybrid_scale_ann_qps": 37.56,
        # beating the band is fine (run-5 tbl batch hit 108.75)
        "hybrid_batch_tbl_qps": 108.75,
        # run-5 contended build
        "ann_huge_ivf_build_sec": 128.849,
        # fast build is fine
        "hybrid_rrf_warm_served": 0.5,
        # non-numeric values never stamp
        "hybrid_batch_ann_qps": None,
    }
    bench.stamp_band_outliers(merged)
    assert merged["hybrid_scale_tbl_qps_outside_band"][0] == 21.92
    assert merged["ann_huge_ivf_build_sec_outside_band"][0] == 128.849
    assert "hybrid_scale_ann_qps_outside_band" not in merged
    assert "hybrid_batch_tbl_qps_outside_band" not in merged
    assert "hybrid_rrf_warm_served_outside_band" not in merged
    assert "hybrid_batch_ann_qps_outside_band" not in merged


def test_outside_band_rides_the_compact_line():
    pq = {"bm25_topk": 1.0,
          "hybrid_scale_tbl_qps_outside_band": [17.41, 33.5, 50.8]}
    _full, compact = _emit_capture(1.0, pq)
    assert compact["queries"]["hybrid_scale_tbl_qps_outside_band"] == [
        17.41, 33.5, 50.8]


def test_is_stable_two_smallest_rule():
    # fewer than 2 runs can never be stable
    assert not bench._is_stable([1.0])
    # two agreeing fast runs pin the cost no matter the outliers
    assert bench._is_stable([6.648, 7.592, 17.777])
    # a decaying sequence with no agreeing pair keeps retrying
    assert not bench._is_stable([5.567, 1.885])
    # the r9 run-3 signature that motivated the rule: both runs hit
    assert bench._is_stable([37.3, 19.9]) is False
    # equal runs are trivially stable
    assert bench._is_stable([2.0, 2.0, 9.0])
