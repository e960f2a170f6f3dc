"""Custom stateful streaming operator: per-file debounce
(reference ST1, ``core/watcher.py:18-120`` — the watcher coalesces
rapid-fire filesystem events and processes a file only after a quiet
gap).

`applyInPandasWithState` holds one pending (ts, payload) per key in
the state store. A new event for the key either *coalesces* into the
pending entry (arrived inside the debounce gap) or *releases* it (the
pending entry had gone quiet before this event arrived, so it is
emitted and the new event becomes pending). A processing-time timeout
flushes keys that go quiet forever. State is keyed per file path, so
the operator scales horizontally with the shuffle — exactly the
watcher semantics, minus the hand-rolled timer wheel.

The state store checkpoint makes this restart-safe: a re-run with the
same checkpoint resumes pending entries (tested across two
availableNow runs in tests/test_stateful_debounce.py).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

OUTPUT_SCHEMA = "source string, ts long, text string"
STATE_SCHEMA = "ts long, text string"


def debounce_fn(gap: int, timeout_ms: int | None = None):
    """Build the applyInPandasWithState function with a fixed quiet-gap
    (same time unit as the `ts` column). `timeout_ms` is the
    processing-time flush for keys that go quiet forever (defaults to
    gap seconds); pass a large value to make runs deterministic when
    wall-clock time must not release state (tests)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            ts, text = state.get
            state.remove()
            yield pd.DataFrame({"source": [key[0]], "ts": [ts], "text": [text]})
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        emitted: list[tuple[int, str]] = []
        pending = state.get if state.exists else None
        for r in rows.itertuples():
            if pending is not None and r.ts >= pending[0] + gap:
                emitted.append(pending)
                pending = (int(r.ts), r.text)
            elif pending is None or int(r.ts) >= pending[0]:
                # within the gap: keep the burst's LATEST payload —
                # a late cross-batch event with an older ts must not
                # overwrite newer pending state (rows are only sorted
                # within one batch)
                pending = (int(r.ts), r.text)
        if pending is not None:
            state.update(pending)
            state.setTimeoutDuration(timeout_ms if timeout_ms is not None else gap * 1000)
        if emitted:
            yield pd.DataFrame(
                {
                    "source": [key[0]] * len(emitted),
                    "ts": [e[0] for e in emitted],
                    "text": [e[1] for e in emitted],
                }
            )

    return fn


def debounced_changes(changes, gap: int, timeout_ms: int | None = None):
    """changes: streaming DataFrame (source, ts, text) → debounced
    stream of the same shape; one output row per quiet-gap-separated
    burst per file, carrying the burst's latest payload."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return changes.groupBy("source").applyInPandasWithState(
        debounce_fn(gap, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
