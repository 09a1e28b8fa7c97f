#!/bin/bash
# One-window decade benching: full sf0.1 + full sf1 + heavy-subset sf10,
# run back-to-back so per-query ratios are host-window comparable
# (CLAUDE.md: never compare absolute totals across windows).
# Usage: scripts/bench_decade.sh <outdir>
set -e
cd "$(dirname "$0")/.."
export GRAFT_XMX=${GRAFT_XMX:-96g}
OUT=${1:-/tmp/bench_r8}
mkdir -p "$OUT"
HEAVY="ann_recall,basket_pairs,dedup_embedding,dedup_fuzzy_edit,dedup_incremental,dedup_method_overlap,dedup_minhash_lsh,dedup_pipeline,dedup_semantic,dedup_semantic_ivf,dedup_threshold_sweep,doc_fingerprint,embed_truncate_eval,embedding_pca,graph_components,hits_scores,label_propagation,media_neardup,media_neardup_stats,media_phash,multitouch_attribution,near_dup_ttl_batch,ngram_jaccard,pagerank_links,parse_rejects,rfm_segments,revenue_concentration,simhash_pairs,split_leakage,star_etl_summary,substring_dedup,value_deciles,winnow_fingerprint"

echo "== full sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_OUT="$OUT" \
  scripts/run_main.sh graft.Bench 2>"$OUT/sf01.err" >"$OUT/sf01.out"
mv "$OUT/bench.json" "$OUT/bench_sf01.json"

echo "== full sf1 =="
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_OUT="$OUT" \
  scripts/run_main.sh graft.Bench 2>"$OUT/sf1.err" >"$OUT/sf1.out"
mv "$OUT/bench.json" "$OUT/bench_sf1.json"

echo "== heavy sf10 =="
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_OUT="$OUT" SPARK_GRAFT_BENCH_ONLY="$HEAVY" \
  scripts/run_main.sh graft.Bench 2>"$OUT/sf10.err" >"$OUT/sf10.out"
mv "$OUT/bench.json" "$OUT/bench_sf10.json"

echo "== decade table =="
python3 scripts/scale_ratios.py "$OUT/bench_sf01.json" "$OUT/bench_sf1.json" "$OUT/bench_sf10.json"
