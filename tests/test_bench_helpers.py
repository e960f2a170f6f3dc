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
    assert len(json.dumps(compact)) < bench.COMPACT_GUARD


def test_emit_results_surfaces_section_errors_truncated():
    pq = {n: 1.0 for n in bench.HEADLINE}
    pq["section_ann_big_error"] = "rc=1 " + "x" * 500
    _, compact = _emit_capture(1.0, pq)
    err = compact["queries"]["section_ann_big_error"]
    assert err.startswith("rc=1") and len(err) <= 60
    assert len(json.dumps(compact)) < bench.COMPACT_GUARD


def test_section_registry_covers_order():
    assert set(bench.SECTION_ORDER) == set(bench.SECTIONS)
    assert bench.SECTION_ORDER[0] == "core"  # headline keys feed `value`


def test_stamp_band_outliers_directions():
    """qps rows flag LOW, seconds rows flag HIGH, in-band and
    above-band(qps)/below-band(sec) rows are left alone — replayed on
    the r9 run-5/6 populations against the r9-era bands (explicit
    bands dict: the live artifact is re-derived every round, and this
    test pins the DIRECTION logic, not a round's values)."""
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
    r9_bands = {
        "round": bench.BANDS_EXPECTED_ROUND, "date": "replay",
        "source_runs": "r9 clean standalone values",
        "qps": {"hybrid_scale_tbl_qps": [33.5, 50.2],
                "hybrid_scale_ann_qps": [32.5, 43.5],
                "hybrid_batch_tbl_qps": [69.7, 121.2],
                "hybrid_batch_ann_qps": [50.0, 56.5]},
        "sec": {"ann_huge_ivf_build_sec": [9.2, 19.6],
                "hybrid_rrf_warm_served": [0.69, 0.96]},
    }
    bench.stamp_band_outliers(merged, r9_bands)
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


def test_shed_policy_keeps_every_data_row_before_stamps():
    """r13 (VERDICT r12 #2) replay of the r12 driver run's shed event:
    the compact line crowded by band stamps + flags shed THREE
    band-tracked data rows (ann_big_auto_route_sec,
    ann_huge_recall_at_10, bm25_update_delta_unstable) while verbose
    [value, lo, hi] stamps stayed. The policy now COMPRESSES stamps
    into an outside_band_rows name list first, then sheds false
    stability flags — every metric key must survive."""
    pq = {n: 11.234 for n in bench.HEADLINE}
    pq.update({k: 155.678 for k in bench.EXTRA_COMPACT_KEYS})
    pq.update({"bm25_topk_warm": 11.2, "hybrid_rrf_warm": 13.5,
               "hybrid_batch_qps": 17.2, "ann_recall_at_10": 0.9938,
               "ann_brute_ms_per_query": 11.98,
               "ann_ivf_ms_per_query": 14.0,
               "ann_big_brute_sec": 12.191, "ann_big_ivf_sec": 11.803,
               "ann_big_recall_at_10": 1.0, "ann_big_ivfpq_sec": 13.592})
    # the r12 run's flag population, and then some: contended/retried
    # sections, one true + many false stability flags, and SIX verbose
    # band stamps
    for s in ("core", "hybrid_scale", "curate", "ann_huge", "ann_big"):
        pq[f"section_{s}_contended"] = True
        pq[f"section_{s}_retried"] = True
    pq["hybrid_batch_unstable"] = True
    for row in ("bm25_update_delta", "hybrid_scale_ann",
                "hybrid_scale_tbl", "bm25_topk_warm", "hybrid_rrf_warm",
                "curate_sf01", "hybrid_scale_skew"):
        pq[f"{row}_unstable"] = False
    for row, lohi in (
        ("ann_huge_ivf_build_sec", [9.2, 19.6]),
        ("hybrid_scale_index_build_sec", [63.0, 90.0]),
        ("hybrid_scale_tbl_qps", [30.7, 45.0]),
        ("ann_big_brute_sec", [1.33, 2.0]),
        ("ann_huge_disk_brute_q2_sec", [2.55, 19.7]),
        ("bm25_topk_warm", [0.848, 1.51]),
    ):
        pq[f"{row}_outside_band"] = [pq.get(row, 999.9)] + lohi
    _full, compact = _emit_capture(134.8, pq)
    q = compact["queries"]
    assert len(json.dumps(compact)) < bench.COMPACT_GUARD
    # THE contract: every metric data row rides the line — none shed
    for k in bench.HEADLINE + bench.EXTRA_COMPACT_KEYS:
        assert k in q, f"data row {k} shed from the compact line"
    for k in ("ann_big_auto_route_sec", "ann_huge_recall_at_10",
              "bm25_topk_warm", "ann_brute_ms_per_query",
              "ann_ivf_ms_per_query"):
        assert k in q, k
    # a true instability flag is never silently lost
    assert q["hybrid_batch_unstable"] is True
    # any compressed stamp still names its row on the line
    full_stamps = [k for k in q if k.endswith("_outside_band")]
    compressed = q.get("outside_band_rows", [])
    assert len(full_stamps) + len(compressed) == 6


def test_units_map_marks_rate_rows():
    """r13 (VERDICT r12 minor #6): the full record carries a units map
    so rate rows are machine-identifiable (PERF r12 inverted five qps
    improvements into regressions)."""
    pq = {"bm25_topk": 1.0, "hybrid_batch_qps": 12.5,
          "ann_huge_disk_prune_ratio": 2.19, "ann_recall_at_10": 0.99,
          "ann_brute_ms_per_query": 1.98,
          "hybrid_batch_unstable": True}
    full, _compact = _emit_capture(1.0, pq)
    units = full["units"]
    assert units["hybrid_batch_qps"] == "qps_higher_better"
    assert units["ann_huge_disk_prune_ratio"] == "ratio_higher_better"
    assert units["ann_recall_at_10"] == "fraction_higher_better"
    assert units["ann_brute_ms_per_query"] == "ms_lower_better"
    assert "bm25_topk" not in units  # plain seconds rows stay implicit
    assert "hybrid_batch_unstable" not in units  # booleans never


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


def test_bands_artifact_loads_and_carries_provenance():
    """r10 (VERDICT r9 #2): the bands live in BANDS.json with
    provenance, and every stamped record names the band population."""
    bands = bench._load_bands()
    assert bands["round"] == bench.BANDS_EXPECTED_ROUND
    assert bands["date"] and bands["source_runs"]
    # every covered row from the verdict's done-criterion is present
    for row in ("hybrid_batch_qps",):
        assert row in bands["qps"]
    for row in ("bm25_topk_warm", "hybrid_rrf_warm",
                "bm25_update_delta_sec", "ann_huge_disk_brute_q2_sec",
                "ann_huge_disk_packed_q2_sec", "curate_sf01_sec"):
        assert row in bands["sec"]
    merged = {}
    bench.stamp_band_outliers(merged)
    assert merged["bands_provenance"]["round"] == bench.BANDS_EXPECTED_ROUND


def test_bands_stale_round_refused(tmp_path, monkeypatch):
    """A bands file from another round must be refused with a clear
    error, not silently mis-stamp (the stale-band risk)."""
    import pytest

    p = tmp_path / "BANDS.json"
    p.write_text('{"round": 9, "qps": {}, "sec": {}}')
    monkeypatch.setattr(bench, "BANDS_FILE", str(p))
    with pytest.raises(RuntimeError, match="round"):
        bench._load_bands()
    monkeypatch.setattr(bench, "BANDS_FILE", str(tmp_path / "missing.json"))
    with pytest.raises(RuntimeError, match="missing"):
        bench._load_bands()


def test_r9_record_would_have_carried_four_more_stamps():
    """The r10 coverage extension replayed on the r9 official record:
    the four depressed core-section rows the r9 verdict could only
    read via BENCH_NOTES now stamp themselves (given the bands the
    r9 notes document)."""
    r9_official = {
        "bm25_topk_warm": 5.587,
        "hybrid_rrf_warm": 17.619,
        "hybrid_batch_qps": 7.05,
        "bm25_update_delta_sec": 5.198,
    }
    r9_bands = {
        "round": bench.BANDS_EXPECTED_ROUND, "date": "replay",
        "source_runs": "r9 clean values per VERDICT/BENCH_NOTES",
        "qps": {"hybrid_batch_qps": [11.0, 13.5]},
        "sec": {"bm25_topk_warm": [1.0, 1.8],
                "hybrid_rrf_warm": [2.2, 3.2],
                "bm25_update_delta_sec": [1.5, 3.4]},
    }
    bench.stamp_band_outliers(r9_official, r9_bands)
    assert r9_official["bm25_topk_warm_outside_band"][0] == 5.587
    assert r9_official["hybrid_rrf_warm_outside_band"][0] == 17.619
    assert r9_official["hybrid_batch_qps_outside_band"][0] == 7.05
    assert r9_official["bm25_update_delta_sec_outside_band"][0] == 5.198


def test_r12_headline_ann_rows_are_banded():
    """r12 (VERDICT r11 #3): every headline ANN serving row is
    row-banded against the shipped artifact — replaying the r12
    wave-mode standalone readings stamps them individually (they
    previously rode only under section-level contended flags), while
    the clean-window readings pass unflagged."""
    bands = bench._load_bands()
    for row in ("ann_big_brute_sec", "ann_big_ivf_sec",
                "ann_huge_ivf_sec", "hybrid_scale_index_build_sec"):
        assert row in bands["sec"]
    for row in ("hybrid_scale_skew_qps", "hybrid_scale_vec_uniform_qps"):
        assert row in bands["qps"]
    wave = {  # r12 standalone attempt 1/2 readings (BENCH_NOTES r12)
        "ann_big_brute_sec": 4.585,
        "ann_huge_ivf_sec": 6.245,
        "hybrid_scale_index_build_sec": 161.62,
    }
    bench.stamp_band_outliers(wave, bands)
    for row in ("ann_big_brute_sec", "ann_huge_ivf_sec",
                "hybrid_scale_index_build_sec"):
        assert f"{row}_outside_band" in wave
    clean = {  # r9 clean ANN rows + r12 clean-window serving rows
        "ann_big_brute_sec": 1.335,
        "ann_big_ivf_sec": 1.522,
        "ann_huge_ivf_sec": 2.27,
        "hybrid_scale_index_build_sec": 78.3,
        "hybrid_scale_skew_qps": 234.22,
        "hybrid_scale_vec_uniform_qps": 212.27,
    }
    bench.stamp_band_outliers(clean, bands)
    assert not [k for k in clean if k.endswith("_outside_band")]


def test_canary_floor_in_bands():
    """The same-day canary floor rides in BANDS.json so a contended
    bench-start baseline cannot disarm the per-section contention
    flags (r10 run-1: baseline 0.1647 vs floor 0.029 — every inflated
    section canary read 'clean' against it)."""
    bands = bench._load_bands()
    assert 0.0 < bands["canary_floor_sec"] < 0.1
    # the clamp rule: min(measured, floor) — a fast box keeps its own
    assert min(0.1647, bands["canary_floor_sec"]) == bands["canary_floor_sec"]
    # r13: the box's quiet canaries dropped to 0.0088-0.0126, so the
    # floor moved 0.0285 -> 0.009 with them
    assert min(0.0088, bands["canary_floor_sec"]) == 0.0088


def test_flag_heavy_record_keeps_graded_rows():
    """r10: a worst-case-noise record (the run-2 flag population)
    must keep every verdict-graded metric in the compact line —
    section flags aggregate into two lists instead of crowding 8
    metrics out."""
    pq = {n: 1.234 for n in bench.HEADLINE}
    pq.update({k: 55.678 for k in bench.EXTRA_COMPACT_KEYS})
    pq.update({"bm25_topk_warm": 1.2, "hybrid_rrf_warm": 3.5,
               "hybrid_batch_qps": 7.2, "ann_recall_at_10": 0.99})
    for s in ("core", "hybrid_scale", "curate", "ann_huge"):
        pq[f"section_{s}_contended"] = True
    for s in ("core", "ann_big", "hybrid_scale", "curate"):
        pq[f"section_{s}_retried"] = True
    pq["curate_sf01_unstable"] = True
    pq["hybrid_scale_tbl_qps_outside_band"] = [5.8, 34.0, 45.0]
    pq["hybrid_batch_ann_qps_outside_band"] = [28.77, 50.0, 56.5]
    pq["ann_huge_ivf_build_sec_outside_band"] = [65.07, 9.2, 19.6]
    _full, compact = _emit_capture(34.8, pq)
    q = compact["queries"]
    assert q["sections_contended"] == ["ann_huge", "core", "curate",
                                       "hybrid_scale"]
    assert q["sections_retried"] == ["ann_big", "core", "curate",
                                     "hybrid_scale"]
    for graded in ("curate_sf01_sec", "bm25_update_delta_sec",
                   "ann_huge_disk_brute_q2_sec",
                   "ann_huge_disk_packed_q2_sec", "hybrid_batch_qps"):
        assert graded in q, graded
    assert q["curate_sf01_unstable"] is True
    assert len(json.dumps(compact)) < bench.COMPACT_GUARD


# --- r11 (VERDICT r10 #1): global budget + incremental emission.
# BENCH_r10.json was rc=124 parsed:null — contention retries pushed the
# run past the driver's outer timeout and the one-shot final emission
# lost every measured row. These tests drive _orchestrate() with a
# deterministic fake clock and scripted per-section costs, pinning the
# two structural guarantees: unaffordable work is SKIPPED (never
# overruns the budget), and the record on stdout grows monotonically
# section by section (a kill loses only the in-flight section).


class _FakeTime:
    """Deterministic clock: the fake section runner advances it by the
    scripted cost, so the budget math sees exactly what we script."""

    def __init__(self, t0=1000.0):
        self.t = t0

    def time(self):
        return self.t

    def sleep(self, s):
        self.t += s


def _drive_orchestrate(monkeypatch, costs, budget, contended=(),
                       retry_map=None, baseline=0.03, estimates=None,
                       run2_records=None):
    """Run bench._orchestrate() with simulated section walls.

    costs: {section: wall_sec} — also installed as SECTION_EST_SEC so
    the fit check sees honest estimates. contended: sections whose
    canaries read 10x the baseline. Returns (emissions, calls, ft):
    every emit_results per_query snapshot (json-roundtripped, so each
    must be serializable), the per-section subprocess call count, and
    the fake clock.
    """
    ft = _FakeTime()
    emissions = []
    calls = {}

    def fake_run(me, name, merged, timeout=3600.0, extra_env=None):
        calls[name] = calls.get(name, 0) + 1
        calls.setdefault("_seq", []).append(name)
        cost = costs[name]
        if cost > timeout:
            ft.t += timeout
            merged[f"section_{name}_error"] = f"timeout after {timeout:.0f}s"
            return None
        ft.t += cost
        canary = baseline * 10 if name in contended else baseline
        if (run2_records is not None and calls[name] == 2
                and name in run2_records):
            # a serving-only retry re-produces only SOME rows (the
            # real _sec_ann_big_retry shape — r11 ADVICE high)
            return {**run2_records[name],
                    "sect_canary_start_sec": canary,
                    "sect_canary_end_sec": canary}
        return {f"{name}_row_sec": round(cost, 1),
                "sect_canary_start_sec": canary,
                "sect_canary_end_sec": canary}

    monkeypatch.setattr(bench, "time", ft)
    monkeypatch.setattr(bench, "_run_section_subprocess", fake_run)
    monkeypatch.setattr(
        bench, "emit_results",
        lambda total, pq: emissions.append(json.loads(json.dumps(pq))))
    monkeypatch.setattr(bench, "_canary_sec", lambda: baseline)
    monkeypatch.setattr(bench, "_loadavg1", lambda: 1.0)
    monkeypatch.setattr(bench, "_load_bands", lambda: {
        "round": bench.BANDS_EXPECTED_ROUND, "date": "sim",
        "source_runs": "sim", "canary_floor_sec": baseline,
        "qps": {}, "sec": {}})
    monkeypatch.setattr(bench, "BENCH_BUDGET_SEC", float(budget))
    monkeypatch.setattr(bench, "SECTION_EST_SEC",
                        dict(estimates if estimates is not None else costs))
    if retry_map is not None:
        monkeypatch.setattr(bench, "RETRY_ON_CONTENTION", retry_map)
    bench._orchestrate()
    return emissions, calls, ft


_WORST = {  # the r10 worst-case (contended) walls, per section
    "core": 450.0, "ann_small": 150.0, "ann_big": 740.0,
    "hybrid_scale": 590.0, "curate": 250.0, "ann_huge": 650.0,
    "sf1": 250.0,
}


def test_budget_skips_unaffordable_sections(monkeypatch):
    """Worst-case costs vs a tight budget: the run must come in UNDER
    budget by skipping tail sections with in-record stamps — never
    overrun (the r10 rc=124)."""
    emissions, calls, ft = _drive_orchestrate(monkeypatch, _WORST, 2000.0)
    assert ft.t - 1000.0 <= 2000.0  # hard guarantee: never overruns
    final = emissions[-1]
    ran = [s for s in bench.SECTION_ORDER if calls.get(s)]
    skipped = [s for s in bench.SECTION_ORDER
               if f"section_{s}_skipped_budget" in final]
    assert skipped, "tight budget must skip something"
    assert ran and set(ran).isdisjoint(skipped)
    for s in skipped:  # stamp carries [estimate, remaining] for audit
        est, rem = final[f"section_{s}_skipped_budget"]
        assert est > rem
    # every section either ran or is stamped-skipped — none vanished
    assert set(ran) | set(skipped) == set(bench.SECTION_ORDER)


def test_budget_skips_unaffordable_retry(monkeypatch):
    """A contended section whose retry cannot fit keeps its first-run
    rows official, stamped contended + retry_skipped_budget, and the
    subprocess is NOT respawned (the r10 killer: unconditional
    retries)."""
    costs = {s: 10.0 for s in bench.SECTION_ORDER}
    costs["ann_big"] = 700.0
    # budget: everything fits once, but a 700s ann_big retry does not
    emissions, calls, ft = _drive_orchestrate(
        monkeypatch, costs, 900.0, contended=("ann_big",),
        retry_map={"ann_big": ["ann_big_row_sec"]})
    final = emissions[-1]
    assert calls["ann_big"] == 1
    assert final["section_ann_big_contended"] is True
    est, rem = final["section_ann_big_retry_skipped_budget"]
    # ann_big is reuse-enabled: the retry estimate is the serving-only
    # cost (RETRY_EST_SEC), not the full build+serve first-run wall
    assert est == bench.RETRY_EST_SEC["ann_big"] and est > rem
    assert final["ann_big_row_sec"] == 700.0  # first run stays official
    assert "section_ann_big_retried" not in final
    assert ft.t - 1000.0 <= 900.0


def test_retry_taken_when_it_fits(monkeypatch):
    """With budget headroom the r9 retry contract is unchanged: one
    re-run, first-run rows preserved under *_run1."""
    costs = {s: 10.0 for s in bench.SECTION_ORDER}
    emissions, calls, _ = _drive_orchestrate(
        monkeypatch, costs, 3300.0, contended=("core",),
        retry_map={"core": ["core_row_sec"]})
    final = emissions[-1]
    assert calls["core"] == 2
    assert final["section_core_retried"] is True
    assert final["core_row_sec_run1"] == 10.0
    assert "section_core_retry_skipped_budget" not in final


def test_incremental_emission_grows_monotonically(monkeypatch):
    """The record is emitted after EVERY section, each a superset of
    the previous — the driver's last-JSON-line parse finds the most
    complete record no matter when the process dies."""
    emissions, calls, _ = _drive_orchestrate(monkeypatch, _WORST, 99999.0)
    # one emission per section + the final one
    assert len(emissions) == len(bench.SECTION_ORDER) + 1
    prev = set()
    for e in emissions:
        assert prev <= set(e)  # strictly growing key set
        assert "wall_total_sec" in e
        assert e["bands_provenance"]["round"] == bench.BANDS_EXPECTED_ROUND
        prev = set(e)
    for i, s in enumerate(bench.SECTION_ORDER):
        assert f"{s}_row_sec" in emissions[i]  # section i's rows are
        # already on stdout before section i+1 starts


def test_hung_section_dies_under_budget_with_record(monkeypatch):
    """A section that would hang past the remaining budget is killed by
    OUR capped subprocess timeout; its error is stamped, the later
    sections still run, the record still emits — and _orchestrate
    exits nonzero so the failure is loud."""
    import pytest

    costs = dict(_WORST)
    costs["ann_big"] = 99999.0  # hangs: exceeds any timeout cap
    with pytest.raises(SystemExit):
        _drive_orchestrate(monkeypatch, costs, 2600.0, estimates=_WORST)


def test_inproc_stamp_failure_emits_with_bands_error(monkeypatch):
    """r10 ADVICE: a stale BANDS.json must not discard an INPROC
    record post-measurement — the band-regeneration path publishes
    unstamped with bands_error in-record."""
    pq = {n: 1.0 for n in bench.HEADLINE}
    monkeypatch.setattr(bench, "run_sections", lambda names: dict(pq))
    monkeypatch.setattr(bench, "_load_bands", lambda: (_ for _ in ()).throw(
        RuntimeError("stale bands round 9")))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_INPROC", "1")
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    buf = _io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    full = json.loads(lines[0])
    assert "stale bands" in full["queries"]["bands_error"]


def test_ratio_band_flags_both_sides():
    """r12 (r11 ADVICE low): the disk-pruning RATIO stamps on BOTH
    sides — depressed (pruning win evaporating) AND inflated (a wave
    hitting only the cold-brute numerator publishes a fake headline
    pruning claim). In-band values do not stamp."""
    bands = {"round": bench.BANDS_EXPECTED_ROUND, "date": "x",
             "source_runs": "sim", "qps": {}, "sec": {},
             "ratio": {"ann_huge_disk_prune_ratio": [3.0, 6.0]}}
    low = {"ann_huge_disk_prune_ratio": 1.7}
    bench.stamp_band_outliers(low, bands)
    assert low["ann_huge_disk_prune_ratio_outside_band"] == [1.7, 3.0, 6.0]
    hi = {"ann_huge_disk_prune_ratio": 12.8}
    bench.stamp_band_outliers(hi, bands)
    assert hi["ann_huge_disk_prune_ratio_outside_band"] == [12.8, 3.0, 6.0]
    mid = {"ann_huge_disk_prune_ratio": 7.5}  # within hi*BAND_RATIO
    bench.stamp_band_outliers(mid, bands)
    assert "ann_huge_disk_prune_ratio_outside_band" not in mid


def test_retry_subset_record_keeps_run1_rows(monkeypatch):
    """r11 ADVICE high: a serving-only retry record that is a strict
    SUBSET of run 1's (the real _sec_ann_big_retry shape — build rows,
    cold pairs, recall rows exist only in run 1) must not drop the
    run-1-only rows when the retry overlays: they are backfilled, so
    band-tracked rows never silently vanish from the record."""
    costs = {s: 10.0 for s in bench.SECTION_ORDER}
    costs["ann_big"] = 700.0
    emissions, calls, _ = _drive_orchestrate(
        monkeypatch, costs, 99999.0, contended=("ann_big",),
        retry_map={"ann_big": ["ann_big_row_sec"]},
        run2_records={"ann_big": {"ann_big_serve2_sec": 5.0}})
    final = emissions[-1]
    assert calls["ann_big"] == 2
    assert final["section_ann_big_retried"] is True
    # the retry's own row is official
    assert final["ann_big_serve2_sec"] == 5.0
    # the run-1-only row SURVIVES the overlay (pre-fix it vanished)
    assert final["ann_big_row_sec"] == 700.0
    # and the explicit *_run1 preservation for retry_keys still works
    assert final["ann_big_row_sec_run1"] == 700.0
    # run-1 canaries preserved under the namespaced run1 key
    assert final["canary_ann_big_run1"] == [0.3, 0.3]


def test_retries_deferred_until_after_sf1_first_run(monkeypatch):
    """r13 (VERDICT r12 #6): the sf1 scale block's FIRST run outranks
    retries of already-measured sections — the r12 orchestrated run
    burned its budget on retries and skipped sf1 at the boundary. A
    contended early section must be re-run only after every section
    (sf1 included) has run once; its stamp flips to False when the
    deferred retry comes back clean."""
    costs = {s: 10.0 for s in bench.SECTION_ORDER}
    emissions, calls, _ = _drive_orchestrate(
        monkeypatch, costs, 3300.0, contended=("core",),
        retry_map={"core": ["core_row_sec"]},
        # contended only on run 1: the fake keys contention on the
        # section name, so flip it off before the retry fires
        run2_records={"core": {"core_row_sec": 9.0}})
    seq = calls["_seq"]
    assert calls["core"] == 2
    assert seq.index("sf1") < len(seq) - 1 - seq[::-1].index("core"), (
        "core's retry ran before sf1's first run: " + str(seq))
    final = emissions[-1]
    assert final["section_core_retried"] is True
    assert final["core_row_sec_run1"] == 10.0
    # sf1's rows are in the record even though a retry was pending
    assert "sf1_row_sec" in final


def test_deferred_clean_retry_flips_contended_to_false(monkeypatch):
    """The deferred retry's canary verdict is the official one: clean
    retry => section_<name>_contended becomes False (an overwrite, so
    emissions stay key-monotonic) and the compact line's
    sections_contended list omits it."""
    costs = {s: 10.0 for s in bench.SECTION_ORDER}

    # contended= keys contention on the NAME for every run; simulate
    # run-1-only contention via a wrapper around the scripted runner
    ft = _FakeTime()
    emissions = []
    calls = {}

    def fake_run(me, name, merged, timeout=3600.0, extra_env=None):
        calls[name] = calls.get(name, 0) + 1
        ft.t += costs[name]
        canary = 0.3 if (name == "core" and calls[name] == 1) else 0.03
        return {f"{name}_row_sec": costs[name],
                "sect_canary_start_sec": canary,
                "sect_canary_end_sec": canary}

    monkeypatch.setattr(bench, "time", ft)
    monkeypatch.setattr(bench, "_run_section_subprocess", fake_run)
    monkeypatch.setattr(
        bench, "emit_results",
        lambda total, pq: emissions.append(json.loads(json.dumps(pq))))
    monkeypatch.setattr(bench, "_canary_sec", lambda: 0.03)
    monkeypatch.setattr(bench, "_loadavg1", lambda: 1.0)
    monkeypatch.setattr(bench, "_load_bands", lambda: {
        "round": bench.BANDS_EXPECTED_ROUND, "date": "sim",
        "source_runs": "sim", "canary_floor_sec": 0.03,
        "qps": {}, "sec": {}})
    monkeypatch.setattr(bench, "BENCH_BUDGET_SEC", 3300.0)
    monkeypatch.setattr(bench, "SECTION_EST_SEC", dict(costs))
    monkeypatch.setattr(bench, "RETRY_ON_CONTENTION",
                        {"core": ["core_row_sec"]})
    bench._orchestrate()
    final = emissions[-1]
    assert calls["core"] == 2
    assert final["section_core_contended"] is False
    assert final["section_core_retried"] is True
    # mid-run emissions carried the honest True stamp before the retry
    assert any(e.get("section_core_contended") is True for e in emissions)
    # the compact aggregation lists only True stamps
    import io as _io2
    from contextlib import redirect_stdout as _rs
    buf = _io2.StringIO()
    with _rs(buf):
        # restore the real emitter for this check
        import importlib
        importlib.reload(bench)
        bench.emit_results(1.0, final)
    compact = json.loads(buf.getvalue().splitlines()[-1])
    assert "core" not in compact["queries"].get("sections_contended", [])


def test_stale_stamp_cleared_when_retry_restores_the_row():
    """r13: a deferred retry overlays a banded row AFTER early
    emissions stamped the contended run-1 value — re-stamping must
    REMOVE the stale stamp once the row is back in band (observed in
    the r13 official run: hybrid_scale_ann_qps 35.33 carried a
    [10.34, ...] stamp from its contended first run)."""
    bands = {"round": bench.BANDS_EXPECTED_ROUND, "date": "x",
             "source_runs": "sim",
             "qps": {"hybrid_scale_ann_qps": [32.25, 43.5]},
             "sec": {"ann_huge_ivf_sec": [2.27, 3.4]},
             "ratio": {"ann_huge_disk_prune_ratio": [1.0, 4.7]}}
    merged = {"hybrid_scale_ann_qps": 10.34, "ann_huge_ivf_sec": 8.6,
              "ann_huge_disk_prune_ratio": 12.0}
    bench.stamp_band_outliers(merged, bands)
    assert merged["hybrid_scale_ann_qps_outside_band"][0] == 10.34
    assert merged["ann_huge_ivf_sec_outside_band"][0] == 8.6
    assert merged["ann_huge_disk_prune_ratio_outside_band"][0] == 12.0
    # the retry overlays in-band values; re-stamp clears all three
    merged["hybrid_scale_ann_qps"] = 35.33
    merged["ann_huge_ivf_sec"] = 2.9
    merged["ann_huge_disk_prune_ratio"] = 2.6
    bench.stamp_band_outliers(merged, bands)
    assert "hybrid_scale_ann_qps_outside_band" not in merged
    assert "ann_huge_ivf_sec_outside_band" not in merged
    assert "ann_huge_disk_prune_ratio_outside_band" not in merged
