#!/bin/bash
# r4 bench campaign: driver-shape best-of + N->4N scaling evidence.
# Runs Bench via spark-submit on the packaged jar (no sbt lock).
cd /root/repo
JAR=target/scala-2.13/lucyjsspark_2.13-0.1.0.jar
OUT=BENCH/r4_campaign.jsonl
run() {
  local tag=$1 cpus=$2 docs=$3 phases=$4
  mkdir -p /dev/shm/spark-local && rm -rf /dev/shm/spark-local/*
  local json
  json=$(SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_DOCS=$docs SPARK_GRAFT_PHASES=$phases \
    /opt/spark/bin/spark-submit --class graft.Bench --master "local[$cpus]" \
      --driver-memory 40g "$JAR" 2>/dev/null | grep '^{"metric"' | tail -1)
  echo "{\"tag\":\"$tag\",\"cpus\":$cpus,\"docs\":$docs,\"data\":$json}" >> "$OUT"
  echo "$(date +%T) done $tag"
}
for i in 1 2 3; do run driver$i 32 300000 ABCDEF; done
for i in 1 2 3; do run scale32_$i 32 2000000 ABCE; done
for i in 1 2 3; do run scale8_$i 8 2000000 ABCE; done
for i in 1 2; do run scale2_$i 2 2000000 ABCE; done
echo CAMPAIGN DONE
