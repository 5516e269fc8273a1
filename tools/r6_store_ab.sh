#!/bin/bash
# Interleaved phase-G A/B at 1M docs: committed design (composite
# term-stats persisted per view generation + counted by warm-behind,
# jar /tmp/storeA.jar) vs the retire-viewstats design (lookups push the
# term predicate below the composite aggregate into pruned part scans;
# warm-behind materializes only the delta relation caches — current
# jar). Both jars carry the two-pass (zero-gap vs warm) live-search
# instrumentation so the one-time engine tax and the steady-state
# serving tax are separated.
cd /root/repo
OUT=BENCH/r6_campaign.jsonl
run() {
  local tag=$1 jar=$2
  mkdir -p /dev/shm/spark-local && rm -rf /dev/shm/spark-local/*
  local json
  json=$(env SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_DOCS=20000 SPARK_GRAFT_PHASES=G \
    SPARK_GRAFT_STORE_DOCS=1000000 \
    /opt/spark/bin/spark-submit --class graft.Bench --master "local[32]" \
      --driver-memory 40g "$jar" 2>/dev/null | grep '^{"metric"' | tail -1)
  if [ -z "$json" ]; then
    echo "{\"tag\":\"$tag\",\"cpus\":32,\"docs\":20000,\"data\":null,\"error\":\"no bench output\"}" >> "$OUT"
    echo "$(date +%T) FAILED $tag" >&2; return 1
  fi
  echo "{\"tag\":\"$tag\",\"cpus\":32,\"docs\":20000,\"data\":$json}" >> "$OUT"
  echo "$(date +%T) done $tag"
}
AJAR=/tmp/storeA.jar
BJAR=target/scala-2.13/lucyjsspark_2.13-0.1.0.jar
for i in 1 2; do
  run store_ab_vs_$i "$AJAR"
  run store_ab_novs_$i "$BJAR"
done
echo "STORE AB DONE"
