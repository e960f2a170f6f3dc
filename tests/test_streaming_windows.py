from __future__ import annotations

import datetime as dt
import json
import os

from mcp_vector_search_spark.streaming.windows import (
    streaming_hourly_rollup,
    streaming_sessionize,
)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def _write(input_dir, name, rows):
    os.makedirs(input_dir, exist_ok=True)
    with open(os.path.join(input_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(stream_df, tmp, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name.startswith("c_") else "append")
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_hourly_rollup_with_watermark(spark, tmp_path):
    ind = str(tmp_path / "in")
    _write(
        ind,
        "b.jsonl",
        [
            {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1, "event_type": "c", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:50:00", "user_id": 1, "event_type": "c", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01T05:00:00", "user_id": 2, "event_type": "v", "value": 5.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(ind)
    _drain(streaming_hourly_rollup(stream), str(tmp_path), "hourly")
    got = {
        (r.hour_us, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    h0 = int(dt.datetime(2024, 1, 1).timestamp() * 1e6)
    # the 00:00 window finalized (watermark advanced past it by event 3)
    assert got[(h0, "c")] == (2, 3.0)


def test_streaming_sessionize(spark, tmp_path):
    ind = str(tmp_path / "in")
    _write(
        ind,
        "b.jsonl",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, "event_type": "c", "value": 0.0},
            {"event_id": 2, "ts": "2024-01-01T00:10:00", "user_id": 7, "event_type": "c", "value": 0.0},
            {"event_id": 3, "ts": "2024-01-01T01:00:00", "user_id": 7, "event_type": "c", "value": 0.0},
            {"event_id": 4, "ts": "2024-01-01T09:00:00", "user_id": 7, "event_type": "c", "value": 0.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(ind)
    _drain(streaming_sessionize(stream), str(tmp_path), "sess")
    got = sorted(
        (r.session_start_us, r.n_events)
        for r in spark.sql("SELECT * FROM sess").collect()
    )
    t = lambda h, m=0: int(dt.datetime(2024, 1, 1, h, m).timestamp() * 1e6)
    # sessions: [00:00,00:10] (2 events), [01:00] — the 09:00 session is
    # still open (watermark), so append mode hasn't emitted it
    assert got == [(t(0), 2), (t(1), 1)]
