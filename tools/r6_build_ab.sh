#!/bin/bash
# Interleaved A/B: is the r6 index_build slowdown (scale32 ib 46-78 s vs
# r5's 27-31 s) code or box? Builds the r5-tagged jar (7ef4208) and the
# current jar, then alternates r5,r6,r5,r6,r5,r6 on the 2 M-doc scale
# protocol (phases ABC only — build + query latency + concurrency) so
# ambient drift hits both sides equally. Appends tagged records to
# BENCH/r6_campaign.jsonl.
cd /root/repo
OUT=BENCH/r6_campaign.jsonl
run() {
  local tag=$1 jar=$2
  mkdir -p /dev/shm/spark-local && rm -rf /dev/shm/spark-local/*
  local json
  json=$(env SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_DOCS=2000000 SPARK_GRAFT_PHASES=ABC \
    /opt/spark/bin/spark-submit --class graft.Bench --master "local[32]" \
      --driver-memory 40g "$jar" 2>/dev/null | grep '^{"metric"' | tail -1)
  if [ -z "$json" ]; then
    echo "{\"tag\":\"$tag\",\"cpus\":32,\"docs\":2000000,\"data\":null,\"error\":\"no bench output\"}" >> "$OUT"
    echo "$(date +%T) FAILED $tag" >&2; return 1
  fi
  echo "{\"tag\":\"$tag\",\"cpus\":32,\"docs\":2000000,\"data\":$json}" >> "$OUT"
  echo "$(date +%T) done $tag"
}
R5JAR=/tmp/r5build/target/scala-2.13/lucyjsspark_2.13-0.1.0.jar
R6JAR=target/scala-2.13/lucyjsspark_2.13-0.1.0.jar
for i in 1 2 3; do
  run ab_r5jar_$i "$R5JAR"
  run ab_r6jar_$i "$R6JAR"
done
echo "AB DONE"
