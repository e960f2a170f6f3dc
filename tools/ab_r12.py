"""Round-12 A/B harness: run a fixed gate subset under a config mode
in a FRESH session and print per-gate best-of-N.

Usage: python tools/ab_r12.py <codec>_<spread|nospread> [runs]
Prints one JSON line {mode, gates: {name: best}, total}.
Run modes interleaved (forward then reverse order) to cancel box
drift; fresh JVM per invocation so codec configs actually apply.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "minhash_jaccard",
    "simhash_near_dups",
    "text_quality",
    "repetition_signals",
    "bm25_topk",
    "kg_stats",
    "sq_fixed",
    "dup_clusters",
]

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    mode = sys.argv[1]
    runs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    subset = sys.argv[3:] or SUBSET
    codec, spread_flag = mode.split("_")
    os.environ["SPARK_GRAFT_IO_CODEC"] = codec

    from mcp_vector_search_spark import io, registry
    from mcp_vector_search_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{mode}")
    spark.sparkContext.setLogLevel("ERROR")

    if spread_flag == "spread":
        base_docs, base_emb = registry._docs, registry._emb
        registry._docs = lambda s, d: io.spread(base_docs(s, d))
        registry._emb = lambda s, d: io.spread(base_emb(s, d))
    elif spread_flag == "spreadall":
        # spread EVERY raw table scan (lineitem/orders/events too)
        orig_table = io.table
        io.table = lambda s, d, n: io.spread(orig_table(s, d, n))

    out: dict[str, float] = {}
    for name in subset:
        fn = registry.SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(f"ab:{mode}:{name}")
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        best = None
        for _ in range(runs_n):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    print(json.dumps({"mode": mode, "gates": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
