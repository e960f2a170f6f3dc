"""Benchmark harness: runs the headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-sink write (computes every
column; .count() would let Catalyst prune the expensive expressions).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "bm25_topk",
    "knn_topk",
    "knn_batch",
    "hybrid_rrf",
    "minhash_jaccard",
    "neighbor_jaccard",
    "text_quality",
    "chunk_windows",
    "events_hourly",
    "sessionize",
    "graph_degree",
    "bfs",
    "pricing_summary",
    "revenue_by_nation",
]


def main():
    from mcp_vector_search_spark.registry import SPARK_QUERIES
    from mcp_vector_search_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not session startup
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = SPARK_QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
