#!/bin/bash
# Profile a list of queries with graft.tools.Profile, one fresh JVM each.
# Usage: scripts/profile_batch.sh <outdir> <query> [query...]
set -u
OUT=$1; shift
mkdir -p "$OUT"
for q in "$@"; do
  echo "=== $q ==="
  java --add-modules=jdk.incubator.vector -XX:+IgnoreUnrecognizedVMOptions \
    --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    -Xmx8g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.Profile "$q" /root/testdata/sf0.1 32 2 \
    > "$OUT/$q.profile.txt" 2> "$OUT/$q.profile.err"
  grep '\[profile\]' "$OUT/$q.profile.txt" | head -3
done
