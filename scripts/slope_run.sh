#!/bin/bash
# Paired sf0.1-vs-sf1 slope measurement for a query subset, run WITHOUT
# the sbt lock (java -cp over the compiled classes; see the verify
# skill). Usage: scripts/slope_run.sh <comma-separated-queries> <sfdir>
set -u
QUERIES="$1"
SFDIR="$2"
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_ITERS="${SPARK_GRAFT_BENCH_ITERS:-3}" \
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
java --add-modules=jdk.incubator.vector -XX:+IgnoreUnrecognizedVMOptions \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  -Xmx24g -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  2>/dev/null | grep '^{'
