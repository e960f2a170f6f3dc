#!/bin/bash
# Round-12 session-2 measurement batch. Run EXCLUSIVE (no concurrent
# Spark). Interleaved fresh-session A/Bs (forward then reverse mode
# order) so box drift cancels; one JSON line per run appended to
# /tmp/ab_r12b.jsonl, profiler outputs to /tmp/profile_r12_<tag>.json.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/ab_r12b.jsonl
: > "$OUT"

EMB="fused_family ann_recall ivf_fused ivf_topk sq_fixed pq_fixed ivf_fixed hybrid_batch_ann embedding_near_dups_clustered embedding_near_dups_multiprobe"
REL="revenue_by_nation graph_degree trace_paths cycles commit_dag_closure sessionize events_lag_delta asof_latest blame_ranges dead_code bfs"

run() {  # mode runs gates...
  echo "=== $* $(date +%H:%M:%S)" >> /tmp/ab_r12b.log
  python tools/ab_r12.py "$@" >> "$OUT" 2>>/tmp/ab_r12b.log
}

run zstd_nospread 2 $EMB
run zstd_spread   2 $EMB
run zstd_spread   2 $EMB
run zstd_nospread 2 $EMB

run zstd_nospread  2 $REL
run zstd_spreadall 2 $REL
run zstd_spreadall 2 $REL
run zstd_nospread  2 $REL

# fresh-session best-of-3 of the gates whose code changed this session
# (bm25 deferral, trace_paths/dead_code edge materialization) plus the
# drift suspects needing a clean re-read
python tools/profile_r12.py --runs 3 --out after6 \
  bm25_incr bm25_incr_bucketed trace_paths dead_code dup_clusters \
  sq_fixed kg_boost minhash_jaccard >> /tmp/ab_r12b.log 2>&1
echo DONE >> /tmp/ab_r12b.log
