"""Event-stream batch operators: tumbling windows, lag deltas,
sessionization (reference W4 trend deltas ``analysis/trends.py``; the
windowed shapes generalize the reference's snapshot-over-time
analytics to event data).

All three are one-shuffle plans: the window/groupBy key is (user) or
(bucket, type), so partial aggregation and AQE coalescing apply. The
same logical shapes run under Structured Streaming (see
``streaming/``) with `window()` + watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def _epoch_us(col):
    # events.ts is TIMESTAMP_NTZ; with the session pinned to UTC the
    # cast to TIMESTAMP is identity and unix_micros is exact integer µs.
    return F.unix_micros(col.cast("timestamp"))


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type → count + value sum. Hour is
    returned as epoch-µs so cross-engine comparison is integer-exact."""
    return (
        events.withColumn("hour_us", _epoch_us(F.date_trunc("hour", F.col("ts"))))
        .groupBy("hour_us", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


def lag_delta(events: DataFrame) -> DataFrame:
    """W4 trend delta: per-user value change vs previous event
    (deterministic order: ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Per-user session stats with a fixed inactivity gap: a session
    breaks when the µs delta to the previous event exceeds `gap_us`.

    Classic two-window plan (lag → cumulative sum of breaks) but both
    windows share the (user_id) partitioning, so it's ONE shuffle; the
    aggregation then rolls up per user without moving data again.
    Streaming equivalent: `session_window()` (see streaming/).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _epoch_us(F.col("ts"))
    with_breaks = events.withColumn(
        "_new_session",
        F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(0),
    )
    return with_breaks.groupBy("user_id").agg(
        (F.sum("_new_session") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key_col: str = "user_id",
    probe_ts_col: str = "pt",
    event_ts_col: str = "ts",
    value_col: str = "event_id",
) -> DataFrame:
    """As-of join: for each (key, probe_ts), the latest event value
    with event_ts ≤ probe_ts (reference G6 temporal queries —
    entities/callers *at* a commit — generalized to event time).

    Scale shape: the union-window trick. Probes and events are tagged
    and unioned, ONE window per key carries the last event value
    forward, probe rows read the carried value. One shuffle on the
    key — no per-probe subquery, no range join blow-up; ties on equal
    timestamps resolve to the largest value (deterministic).
    """
    e = events.select(
        F.col(key_col).alias("_k"),
        F.col(event_ts_col).alias("_t"),
        F.lit(0).alias("_p"),
        F.col(value_col).alias("_v"),
    )
    p = probes.select(
        F.col(key_col).alias("_k"),
        F.col(probe_ts_col).alias("_t"),
        F.lit(1).alias("_p"),
        F.lit(None).cast(e.schema["_v"].dataType).alias("_v"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_p", "_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = e.unionByName(p).withColumn(
        "_last", F.last("_v", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_p") == 1).select(
        F.col("_k").alias(key_col),
        F.col("_t").alias(probe_ts_col),
        F.col("_last").alias(f"last_{value_col}"),
    )


def blame_range_join(
    hunks: DataFrame,
    chunks: DataFrame,
    file_col: str = "doc_id",
) -> DataFrame:
    """J13 blame range join (reference ``core/git_blame.py``): commit
    hunk line ranges ↔ chunk line ranges, overlap semantics
    ``h.start <= c.end AND h.end >= c.start`` on the same file.

    hunks:  (file, h_start, h_end, commit_id)
    chunks: (file, c_start, c_end, chunk_key)

    Plan shape: the file key makes this an equi-join (one shuffle on
    file) with the range predicate applied as a post-join filter —
    Spark's sort-merge join handles it without a cartesian product.
    Per chunk we emit the blame rollup the reference surfaces: number
    of touching commits and the latest commit id.
    """
    overlap = (F.col("h_start") <= F.col("c_end")) & (
        F.col("h_end") >= F.col("c_start")
    )
    return (
        chunks.join(hunks, on=[file_col], how="inner")
        .filter(overlap)
        .groupBy(file_col, "chunk_key", "c_start", "c_end")
        .agg(
            F.countDistinct("commit_id").alias("n_commits"),
            F.max("commit_id").alias("last_commit"),
        )
    )
