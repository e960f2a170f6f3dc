"""r13 codec A/B for the ANN serving-latency family (VERDICT r12 #1).

The r12 driver run regressed three unbanded serving rows —
`ann_huge_ivf_f32_sec` 2.06→5.13 s, `ann_ivf_ms_per_query` 2.14→4.0,
`ann_brute_ms_per_query` 1.55→1.98 — inside wave-hit sections. The one
engine-side r12 change touching every small serving shuffle is the
session-wide `spark.io.compression.codec=zstd` default. This harness
rules it in or out: interleaved fresh-session arms (lz4, zstd, lz4,
zstd), each arm reproducing the bench's exact serving shapes with the
bench's quiesce/best-of-N methodology, canary-bracketed so a wave
cannot masquerade as a codec effect.

Usage:
    python tools/ab_codec_r13.py            # orchestrate 2x2 arms
    python tools/ab_codec_r13.py --arm lz4  # one arm (subprocess)

Run EXCLUSIVE — concurrent Spark work pollutes every number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HUGE_INFLATE = 2048
RUNS = 3


def _arm(codec: str) -> None:
    os.environ["SPARK_GRAFT_IO_CODEC"] = codec
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    import bench  # reuse _canary_sec/_quiesce/_noop/_inflate helpers

    from pyspark.sql import functions as F

    from mcp_vector_search_spark import io as eio
    from mcp_vector_search_spark.operators.ivf import (
        ivf_build,
        ivf_build_sampled_packed,
        ivf_pack_fused,
        ivf_topk_batch_np,
        ivf_topk_batch_packed,
    )
    from mcp_vector_search_spark.operators.topk import topk_per_query_np
    from mcp_vector_search_spark.session import get_spark

    out: dict = {"codec": codec}
    out["canary_start"] = bench._canary_sec()
    spark = get_spark(app_name=f"ab_codec_{codec}")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.io.compression.codec") == codec

    def runs_of(fn):
        bench._quiesce(spark)
        r = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            r.append(round(time.time() - t0, 3))
        return r

    # --- ann_small family (the ms_per_query rows), bench shapes ------
    emb = eio.table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    wq = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bench._noop(topk_per_query_np(emb, wq, 10))  # warm kernels untimed
    assigned, centroids = ivf_build(emb)
    assigned = assigned.cache()
    assigned.count()
    bench._noop(ivf_topk_batch_np(assigned, centroids, wq, 10, nprobes=4))
    q1024 = emb.filter(F.col("vec_id") < 1024).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    n_q = q1024.count()
    out["brute_q1024_runs"] = runs_of(
        lambda: bench._noop(topk_per_query_np(emb, q1024, 10)))
    out["ann_brute_ms_per_query"] = round(
        min(out["brute_q1024_runs"]) * 1000 / n_q, 2)
    out["ivf_q1024_runs"] = runs_of(
        lambda: bench._noop(ivf_topk_batch_np(
            assigned, centroids, q1024, 10, nprobes=bench.BENCH_NPROBES)))
    out["ann_ivf_ms_per_query"] = round(
        min(out["ivf_q1024_runs"]) * 1000 / n_q, 2)
    q1024.unpersist()
    assigned.unpersist()
    out["canary_mid"] = None  # set after session work pauses below

    # --- ann_huge f32 serving (the worst r12 row), bench shapes ------
    huge = bench._inflate_embeddings(spark, emb, HUGE_INFLATE).cache()
    out["n_huge"] = huge.count()
    huge_q = bench._inflated_queries(huge, HUGE_INFLATE, 128).cache()
    n_huge_q = huge_q.count()
    t0 = time.time()
    huge_packed, huge_cents = ivf_build_sampled_packed(huge, num_clusters=512)
    huge_packed = huge_packed.cache()
    huge_packed.count()
    out["build_sec"] = round(time.time() - t0, 3)
    # warm the packed kernel once untimed (cold subprocess)
    bench._noop(ivf_topk_batch_packed(
        huge_packed, huge_cents, huge_q.limit(2), 10, nprobes=2))
    out["ivf_f64_runs"] = runs_of(
        lambda: bench._noop(ivf_topk_batch_packed(
            huge_packed, huge_cents, huge_q, 10, nprobes=20)))
    out["ann_huge_ivf_sec"] = min(out["ivf_f64_runs"])
    packed32 = ivf_pack_fused(huge, huge_cents, dtype="float32").cache()
    packed32.count()
    out["ivf_f32_runs"] = runs_of(
        lambda: bench._noop(ivf_topk_batch_packed(
            packed32, huge_cents, huge_q, 10, nprobes=20)))
    out["ann_huge_ivf_f32_sec"] = min(out["ivf_f32_runs"])
    out["n_huge_q"] = n_huge_q
    spark.stop()
    time.sleep(2)
    out["canary_end"] = bench._canary_sec()
    print(json.dumps(out), flush=True)


def main() -> None:
    if "--arm" in sys.argv:
        _arm(sys.argv[sys.argv.index("--arm") + 1])
        return
    me = os.path.abspath(__file__)
    results = []
    for codec in ("lz4", "zstd", "lz4", "zstd"):
        p = subprocess.run(
            [sys.executable, me, "--arm", codec],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            print(json.dumps({"codec": codec, "error": p.stderr[-400:]}),
                  flush=True)
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    summary = {}
    for codec in ("lz4", "zstd"):
        arms = [r for r in results if r["codec"] == codec]
        for row in ("ann_brute_ms_per_query", "ann_ivf_ms_per_query",
                    "ann_huge_ivf_sec", "ann_huge_ivf_f32_sec"):
            vals = [a[row] for a in arms if row in a]
            if vals:
                summary[f"{row}_{codec}"] = min(vals)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
