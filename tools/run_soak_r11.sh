#!/bin/bash
# Round-11 soak refresh (VERDICT #2): re-times the §8.0 table on r11 code
# (the r10 array_distinct rewrite + r11 cache drops), four decades,
# settled protocol (parts = CPUS = 16, 24g heap, median-of-3 interleaved).
# Adds the queries the r10/r11 rewrites changed (q75/q76/q86/q87) to the
# recorded families. Usage: run_soak_r11.sh [out-log]
set -u
cd /root/repo
OUT="${1:-/tmp/soak_r11.log}"
QUERIES="q01_range_scan_limit,q12_inner_join,q16_join3_agg_topk,q19_range_join,q30_groupby_agg,q38_percentiles,q48_downsample,q49_rate,q55_salted_agg,q62_math_fns,q70_tumbling_window,q75_decontaminate_bloom,q76_decontaminate,q78_simhash_neardup,q79_minhash_jaccard_est,q81_shingle_jaccard,q85_minhash_lsh,q86_simhash,q87_lang_id,q95_ngram_jaccard,q99_knn_join,q100_dup_clusters"
: > "$OUT"
for dir in /root/testdata/sf0.1 /tmp/scale10 /tmp/scale26 /tmp/scale100; do
  echo "=== soak $dir parts=16 ===" >> "$OUT"
  tools/run_soak.sh "$dir" 16 "$QUERIES" 2>/dev/null | grep '"metric"' >> "$OUT"
done
echo "=== done ===" >> "$OUT"
