#!/bin/bash
# Round-10 drift adjudication (VERDICT r9 demand #2): each query in its
# OWN fresh JVM, min-of-N at sf0.1 — isolates the r7->r9 quiet-map
# inflation from any 408-query single-JVM suite pressure (code cache,
# GC, accumulated catalog state). Output: one JSON line per query.
set -u
OUT="${1:-/tmp/drift_r10.jsonl}"
: > "$OUT"
for Q in search_rrf_fusion dedup_simhash dedup_ngram_jaccard \
         q5_region_revenue q2_min_cost_supplier graph_degrees \
         ml_conformal graph_hits; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ITERS=3 SPARK_GRAFT_BENCH_ONLY="$Q" \
  java --add-modules=jdk.incubator.vector -XX:+IgnoreUnrecognizedVMOptions \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    -Xmx24g -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null | grep '^{' >> "$OUT"
done
