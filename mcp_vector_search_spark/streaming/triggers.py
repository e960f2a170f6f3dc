"""Reindex trigger policy — the ST2/ST3 surface (reference:
search-triggered reindex ``core/search.py`` staleness check + git-hook
/ scheduled reindex ``cli/commands/index.py``): decide WHEN an
incremental reindex runs, given a stream of trigger requests.

The reference couples this to its process model (a search call checks
mtimes and kicks a thread; a git hook shells out). Spark-first, the
policy is a stateful streaming operator over a unified trigger-request
stream:

    (project string, ts long, kind string, stale_count long)

- kind='search'  — a search observed `stale_count` stale files; fires
  only when stale_count ≥ min_stale (searches against a fresh index
  must NOT cause churn);
- kind='git_hook' / 'schedule' — explicit requests (post-commit hook,
  cron tick); always considered dirty.

One `applyInPandasWithState` keyed by project holds the last-fired
timestamp; any qualifying request inside `cooldown` is suppressed —
the rate limit that keeps a hot search path or a chatty hook from
re-running the indexer in a loop. Emitted rows are reindex COMMANDS;
wiring them into `incremental.process_batch` via foreachBatch is the
deployment glue (same pattern as start_incremental_index).

State is one (long) per project — bounded by project count, restart-
safe via the checkpoint like the ST1 debounce.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

OUTPUT_SCHEMA = "project string, ts long, kind string, stale_count long"
STATE_SCHEMA = "last_fired long"

FORCED_KINDS = ("git_hook", "schedule")


def trigger_policy_fn(cooldown: int, min_stale: int = 1):
    """Build the applyInPandasWithState function. `cooldown` is in the
    same unit as `ts`; `min_stale` is the staleness threshold for
    search-observed triggers."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        last = state.get[0] if state.exists else None
        out: list[tuple[int, str, int]] = []
        for r in rows.itertuples():
            # forced kinds carry no meaningful stale_count — a NULL
            # arrives as NaN, which int() would crash the micro-batch on
            stale = 0 if pd.isna(r.stale_count) else int(r.stale_count)
            qualifies = r.kind in FORCED_KINDS or (
                r.kind == "search" and stale >= min_stale
            )
            in_cooldown = last is not None and int(r.ts) < last + cooldown
            if qualifies and not in_cooldown:
                out.append((int(r.ts), str(r.kind), stale))
                last = int(r.ts)
        if last is not None:
            state.update((last,))
        if out:
            yield pd.DataFrame(
                {
                    "project": [key[0]] * len(out),
                    "ts": [o[0] for o in out],
                    "kind": [o[1] for o in out],
                    "stale_count": [o[2] for o in out],
                }
            )

    return fn


def reindex_triggers(requests, cooldown: int, min_stale: int = 1):
    """requests: streaming DataFrame (project, ts, kind, stale_count)
    → rate-limited stream of reindex commands, one state row per
    project."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return requests.groupBy("project").applyInPandasWithState(
        trigger_policy_fn(cooldown, min_stale),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
