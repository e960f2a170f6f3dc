"""ST2/ST3 reindex trigger policy: applyInPandasWithState rate limit.

Reference behavior: a search against a stale index kicks a reindex
(core/search.py staleness check) and git hooks / schedules request one
explicitly (cli/commands/index.py) — but repeated requests must not
re-run the indexer in a loop. Two availableNow runs over one
checkpoint prove (a) fresh-index searches never fire, (b) qualifying
requests fire, (c) the cooldown suppresses storms, (d) the last-fired
state survives a restart.
"""

from __future__ import annotations

import json
import os


def _write(input_dir: str, name: str, rows: list[dict]):
    os.makedirs(input_dir, exist_ok=True)
    with open(os.path.join(input_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, input_dir, out_dir, ckpt, cooldown=30, min_stale=1):
    from mcp_vector_search_spark.streaming.triggers import reindex_triggers

    reqs = spark.readStream.schema(
        "project string, ts long, kind string, stale_count long"
    ).json(input_dir)
    q = (
        reindex_triggers(reqs, cooldown=cooldown, min_stale=min_stale)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_trigger_policy_cooldown_and_resume(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(
        input_dir,
        "b1.jsonl",
        [
            # fresh-index search: never fires
            {"project": "p1", "ts": 0, "kind": "search", "stale_count": 0},
            # stale search: fires, starts the cooldown clock
            {"project": "p1", "ts": 5, "kind": "search", "stale_count": 3},
            # storm inside the cooldown: suppressed, even the forced kind
            {"project": "p1", "ts": 10, "kind": "search", "stale_count": 9},
            {"project": "p1", "ts": 20, "kind": "git_hook", "stale_count": 0},
            # after the cooldown: fires again
            {"project": "p1", "ts": 40, "kind": "git_hook", "stale_count": 0},
            # independent project keys don't share the clock
            {"project": "p2", "ts": 6, "kind": "schedule", "stale_count": 0},
        ],
    )
    _run(spark, input_dir, out_dir, ckpt)
    got = {
        (r.project, r.ts, r.kind)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        ("p1", 5, "search"),
        ("p1", 40, "git_hook"),
        ("p2", 6, "schedule"),
    }

    # restart on the same checkpoint: p1 last fired at 40, so ts=60 is
    # still inside cooldown=30 and must stay suppressed; ts=75 fires.
    _write(
        input_dir,
        "b2.jsonl",
        [
            {"project": "p1", "ts": 60, "kind": "schedule", "stale_count": 0},
            {"project": "p1", "ts": 75, "kind": "git_hook", "stale_count": 0},
        ],
    )
    _run(spark, input_dir, out_dir, ckpt)
    got = {
        (r.project, r.ts, r.kind)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("p1", 60, "schedule") not in got
    assert ("p1", 75, "git_hook") in got


def test_trigger_null_stale_count_on_forced_kind(spark):
    """git_hook/schedule rows naturally carry NULL stale_count; the
    policy must emit them (stale 0) instead of crashing on NaN."""
    import numpy as np
    import pandas as pd

    from mcp_vector_search_spark.streaming.triggers import trigger_policy_fn

    fn = trigger_policy_fn(cooldown=10)

    class FakeState:
        exists = False
        hasTimedOut = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            pass

    pdf = pd.DataFrame(
        {"ts": [100], "kind": ["git_hook"], "stale_count": [np.nan]}
    )
    out = list(fn(("proj",), [pdf], FakeState()))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["kind"] == "git_hook" and row["stale_count"] == 0
