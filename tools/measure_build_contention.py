"""Box-vs-engine tiebreak for multi-minute build rows (VERDICT r10 #2,
r11 #1).

A section's canary bracket samples only the boundaries; a wave that
arrives DURING a multi-minute build window inflates the build row
while both boundary canaries read clean (observed 2026-08-16 evening:
boundaries 0.0342/0.0345 with build 141.3 s vs the r9 clean band
[9.2, 19.6]). This experiment runs a build sequence with a sampler
SUBPROCESS timing the same 1536² matmul canary every ~6 s the whole
way, then prints per-phase walls alongside the canary samples that
overlapped each phase. If the build is slow while its overlapping
canaries are slow, the box owns the number; if the build is slow over
clean canaries, the engine does.

Two modes:
  (default)  the ann_huge ANN build: warmup → ×2048 inflate+cache →
             fused 512-cluster build ×2.
  --bm25     the hybrid_scale BM25 build (VERDICT r11 #1): docs ×256
             caesar-inflate → write_bm25_index(term_buckets=64) ×2 —
             the exact sequence behind hybrid_scale_index_build_sec,
             the one row whose only near-clean r11 sample (155.1 s)
             sat ~2× over its 74.8 s r6-era note.

Usage: python tools/measure_build_contention.py [--bm25] [sf_dir]
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


def _phases_ann(bench, spark, sf_dir, phase, holder):
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


def _phases_bm25(bench, spark, sf_dir, phase, holder, workdir):
    """The EXACT hybrid_scale BM25 build: sf0.1 documents ×256 via the
    per-variant caesar shift, then write_bm25_index(term_buckets=64)
    (bench.py sec_hybrid_scale, hybrid_scale_index_build_sec)."""
    from pyspark.sql import functions as F

    from mcp_vector_search_spark import io as eio
    from mcp_vector_search_spark.operators.bm25 import write_bm25_index

    INFLATE = 256

    def warm():
        # small warmup build so the first timed phase doesn't pay plan
        # codegen / JVM JIT (same reasoning as the section's untimed
        # serving warmup)
        docs01 = eio.table(spark, sf_dir, "documents")
        write_bm25_index(docs01, os.path.join(workdir, "warm_idx"))

    phase("warmup_small_build", warm)

    docs01 = eio.table(spark, sf_dir, "documents")
    dv = F.broadcast(
        spark.range(INFLATE).select(F.col("id").cast("int").alias("_v"))
    )
    ncpu = spark.sparkContext.defaultParallelism
    docs_big = docs01.crossJoin(dv).repartition(ncpu).select(
        (F.col("doc_id") * INFLATE + F.col("_v")).cast("long").alias("doc_id"),
        bench._caesar_shift_expr("text", 26, "_v").alias("text"),
    )

    def build():
        write_bm25_index(docs_big, os.path.join(workdir, "idx1"),
                         term_buckets=64)

    phase("bm25_x256_build", build)

    def build2():
        write_bm25_index(docs_big, os.path.join(workdir, "idx2"),
                         term_buckets=64)

    phase("bm25_x256_build_run2", build2)

    holder["n"] = None


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    bm25_mode = "--bm25" in argv
    if bm25_mode:
        argv.remove("--bm25")
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    import bench  # noqa: E402  (repo root on sys.path)

    fd, samples_path = tempfile.mkstemp(prefix="canary_samples_")
    os.close(fd)
    sampler = subprocess.Popen([sys.executable, "-c", SAMPLER, samples_path])
    phases: list[tuple[str, float, float]] = []

    def phase(name, fn):
        t0 = time.time()
        fn()
        phases.append((name, t0, time.time()))

    holder: dict = {}
    spark = None
    workdir = tempfile.TemporaryDirectory(prefix="bm25_contention_")
    try:
        spark = bench._get_spark()
        if bm25_mode:
            _phases_bm25(bench, spark, sf_dir, phase, holder, workdir.name)
        else:
            _phases_ann(bench, spark, sf_dir, phase, holder)
    finally:
        # stop the JVM and the sampler even on a mid-phase exception —
        # the partial phase table below still prints (r11 ADVICE low)
        if spark is not None:
            try:
                spark.stop()
            except Exception:
                pass
        sampler.terminate()
        workdir.cleanup()

    samples = [json.loads(l) for l in open(samples_path)]
    os.unlink(samples_path)
    report = {"sf_dir": sf_dir, "mode": "bm25" if bm25_mode else "ann",
              "n_vectors": holder.get("n"), "phases": []}
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
