"""Box-vs-engine tiebreak for the ann_huge build band (VERDICT r10 #2).

The section's canary bracket samples only the boundaries; a wave that
arrives DURING the multi-minute build window inflates the build row
while both boundary canaries read clean (observed 2026-08-16 evening:
boundaries 0.0342/0.0345 with build 141.3 s vs the r9 clean band
[9.2, 19.6]). This experiment runs the EXACT ann_huge build sequence
(warmup → ×2048 inflate+cache → fused 512-cluster build) with a
sampler SUBPROCESS timing the same 1536² matmul canary every ~6 s the
whole way, then prints per-phase walls alongside the canary samples
that overlapped each phase. If the build is slow while its
overlapping canaries are slow, the box owns the number; if the build
is slow over clean canaries, the engine does.

Usage: python tools/measure_build_contention.py [sf_dir]
One JSON line at the end; human-readable phase table on stderr.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLER = r"""
import json, sys, time
import numpy as np
a = np.full((1536, 1536), 0.5)
out = open(sys.argv[1], "a")
while True:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ a).sum()
        best = min(best, time.perf_counter() - t0)
    out.write(json.dumps([time.time(), round(best, 4)]) + "\n")
    out.flush()
    time.sleep(3)
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    import bench  # noqa: E402  (repo root on sys.path)

    samples_path = tempfile.mktemp(prefix="canary_samples_")
    sampler = subprocess.Popen([sys.executable, "-c", SAMPLER, samples_path])
    phases: list[tuple[str, float, float]] = []

    def phase(name, fn):
        t0 = time.time()
        fn()
        phases.append((name, t0, time.time()))

    try:
        spark = bench._get_spark()
        from pyspark.sql import functions as F

        from mcp_vector_search_spark import io as eio
        from mcp_vector_search_spark.operators.ivf import (
            ivf_build_sampled_packed,
            ivf_topk_batch_packed,
        )
        from mcp_vector_search_spark.operators.topk import topk_per_query_np

        emb = eio.table(spark, sf_dir, "embeddings").cache()
        emb.count()

        def warm():
            wp, wc = ivf_build_sampled_packed(emb, num_clusters=4)
            wp = wp.cache()
            wp.count()
            wq = emb.filter(F.col("vec_id") < 4).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            bench._noop(ivf_topk_batch_packed(wp, wc, wq, 10, nprobes=4))
            bench._noop(topk_per_query_np(emb, wq, 10))
            wp.unpersist()

        phase("warmup", warm)
        holder = {}

        def inflate():
            huge = bench._inflate_embeddings(spark, emb, 2048).cache()
            holder["n"] = huge.count()
            holder["huge"] = huge

        phase("inflate_cache_4m", inflate)

        def build():
            packed, cents = ivf_build_sampled_packed(
                holder["huge"], num_clusters=512)
            packed = packed.cache()
            holder["blocks"] = packed.count()
            holder["packed"] = packed

        phase("fused_build_512", build)
        # a second build over the same cached corpus: if run 1 caught a
        # wave, run 2 disagrees; if both agree over clean canaries, the
        # cost is real
        def build2():
            packed, cents = ivf_build_sampled_packed(
                holder["huge"], num_clusters=512)
            holder["blocks2"] = packed.count()

        phase("fused_build_512_run2", build2)
        spark.stop()
    finally:
        sampler.terminate()

    samples = [json.loads(l) for l in open(samples_path)]
    os.unlink(samples_path)
    report = {"sf_dir": sf_dir, "n_vectors": holder.get("n"), "phases": []}
    for name, t0, t1 in phases:
        inside = [v for (t, v) in samples if t0 <= t <= t1]
        report["phases"].append({
            "phase": name,
            "wall_sec": round(t1 - t0, 1),
            "canary_n": len(inside),
            "canary_min": min(inside) if inside else None,
            "canary_median": (sorted(inside)[len(inside) // 2]
                              if inside else None),
            "canary_max": max(inside) if inside else None,
        })
        print(f"[phase] {name}: {t1 - t0:.1f}s  canaries "
              f"n={len(inside)} min={min(inside) if inside else '-'} "
              f"med={sorted(inside)[len(inside)//2] if inside else '-'} "
              f"max={max(inside) if inside else '-'}", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
