"""Round-13 optimization profiler (r13 twin of profile_r12.py): time every registry query at a
given SF with the noop sink (guide §1.4) and capture
``explain('formatted')`` for each (guide §7.2).

Usage:
    python tools/profile_r13.py [sf_dir] [--runs N] [--out TAG] [names...]

Writes:
    plans/r13/<name>_<TAG>.txt    — formatted plan per query
    /tmp/profile_r13_<TAG>.json   — {name: {"runs": [...], "best": s}}

Methodology matches bench.py: one quiesce (gc) before each query's
runs, noop sink so the computation (not the sink or a count-pruned
subtree) is timed, jobs labeled per query. Run EXCLUSIVE — any
concurrent Spark work pollutes the numbers.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs_n = 2
    tag = "before"
    if "--runs" in args:
        i = args.index("--runs")
        runs_n = int(args[i + 1])
        del args[i:i + 2]
    if "--out" in args:
        i = args.index("--out")
        tag = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from mcp_vector_search_spark.registry import SPARK_QUERIES
    from mcp_vector_search_spark.session import get_spark

    spark = get_spark(app_name=f"profile_r13_{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    todo = names or list(SPARK_QUERIES)
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in todo:
        fn = SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            df = fn(spark, sf_dir)
            # plan capture (cheap, before timing)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            runs = []
            for _ in range(runs_n):
                t0 = time.time()
                # fresh frame each run: lifecycle queries (bm25_incr*)
                # do their work inside fn; reusing df would time a
                # collected snapshot for those
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            out[name] = {"runs": runs, "best": min(runs)}
            print(f"{name}: {runs}", flush=True)
        except Exception as e:  # keep sweeping; record the failure
            out[name] = {"error": str(e)[:300]}
            print(f"{name}: ERROR {e}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    with open(f"/tmp/profile_r13_{tag}.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    ranked = sorted((v["best"], k) for k, v in out.items() if "best" in v)
    print("\n=== slowest ===")
    for s, k in ranked[-20:]:
        print(f"{s:9.3f}  {k}")


if __name__ == "__main__":
    main()
