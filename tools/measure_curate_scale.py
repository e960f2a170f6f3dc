"""One-off: does the END-TO-END curation pipeline scale linearly
across a data decade? bench's sf1 section scales the individual gate
queries; this measures the COMPOSED `curate_corpus` chain (quality
filter → exact dedup → LSH near-dedup → decontaminate → split → pack
→ bins) at sf0.1 (5,000 docs) and a derived 10× (50,000 docs,
bench-style caesar-shifted replicas with disjoint id spaces so the
replicas are neither exact nor near dups), both sides spread to the
same parallelism so the ratio is a pure data-scaling number.

Also times the zero-shuffle `repetition_signals` scan at both scales
(the r9 claim: per-row folds scale with bytes, no shuffle to curve).

Results land in BENCH_NOTES.md; too heavy for the per-round wall in
combination with the bench's own sf1 section.

Usage: python tools/measure_curate_scale.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _caesar_shift_expr  # noqa: E402
from mcp_vector_search_spark import io as eio  # noqa: E402
from mcp_vector_search_spark.api import SparkProject  # noqa: E402
from mcp_vector_search_spark.registry import q_repetition_signals  # noqa: E402
from mcp_vector_search_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _curate_once(spark, docs, bench_docs, label, out):
    from pyspark.sql import functions as F

    p = SparkProject(spark, docs, docs.limit(0), spread=False)
    t0 = time.time()
    bins, report = p.curate_corpus(
        max_tokens=2048,
        benchmark=bench_docs,
        quality_filter="gopher",
        n_shards=32,
    )
    n_bins = bins.count()
    out[f"curate_{label}_wall_sec"] = round(time.time() - t0, 2)
    out[f"curate_{label}_bins"] = n_bins
    out[f"curate_{label}_stages"] = {
        r["stage"]: r["n_docs"] for r in report.collect()
    }


def main() -> None:
    from pyspark.sql import functions as F

    out: dict = {"sf_dir": SF_DIR}
    spark = get_spark(
        app_name="measure_curate_scale", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs1 = eio.table(spark, SF_DIR, "documents").repartition(CPUS).cache()
    n1 = docs1.count()
    REPL, OFF = 10, 1_000_000
    reps = F.broadcast(
        spark.range(REPL).select(F.col("id").cast("int").alias("_r"))
    )
    docs10 = (
        docs1.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r").cast("long") * OFF).alias("doc_id"),
            _caesar_shift_expr("text", REPL, "_r").alias("text"),
            "lang",
            F.concat(F.col("source"), F.lit("#"), F.col("_r")).alias("source"),
            "n_chars",
        )
        .repartition(CPUS)
        .cache()
    )
    n10 = docs10.count()
    out["n_docs_1x"], out["n_docs_10x"] = n1, n10

    # a tiny benchmark set for the decontamination stage: 8 docs'
    # ORIGINAL text (so stage 2c has real matches at 1x, and the
    # caesar-shifted replicas at 10x legitimately don't match — the
    # stage still scans all 10x of grams, which is what's being timed)
    bench_docs = docs1.limit(8).select("doc_id", "text").cache()
    bench_docs.count()

    # repetition_signals scan at both scales (zero-shuffle fold claim)
    for label, frame in (("1x", docs1), ("10x", docs10)):
        from mcp_vector_search_spark.operators.analytics import (
            text_quality_frame,
        )
        from mcp_vector_search_spark.functions.text import (
            dup_ngram_fraction,
            top_ngram_fraction,
            tokenize,
            word_ngrams,
        )

        t0 = time.time()
        sig = frame.select(
            "doc_id",
            top_ngram_fraction(word_ngrams(tokenize("text"), 3)).alias("t3"),
            dup_ngram_fraction(word_ngrams(tokenize("text"), 5)).alias("d5"),
        )
        sig.agg(F.sum("t3"), F.sum("d5")).collect()
        out[f"repetition_scan_{label}_sec"] = round(time.time() - t0, 2)

    # warm the pipeline's plan shapes once at 1x untimed, then time
    # both scales (same JIT state for both sides of the ratio)
    _curate_once(spark, docs1, bench_docs, "warmup", {})
    _curate_once(spark, docs1, bench_docs, "1x", out)
    _curate_once(spark, docs10, bench_docs, "10x", out)
    out["curate_ratio_10x_over_1x"] = round(
        out["curate_10x_wall_sec"] / max(out["curate_1x_wall_sec"], 1e-9), 2
    )
    out["repetition_ratio"] = round(
        out["repetition_scan_10x_sec"]
        / max(out["repetition_scan_1x_sec"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
