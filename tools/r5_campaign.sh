#!/bin/bash
# r5 bench campaign: driver-shape best-of (now with ANN recall + store
# phase), N->4N scaling evidence, and the three r5 soaks — dedup-family
# 1M-doc planted-truth soak (phase H), 1M-doc store soak (phase G), and
# 10M-vector ANN with measured recall (phase F).
# Runs Bench via spark-submit on the packaged jar (no sbt lock).
# Reps run STRICTLY sequentially — never overlap a scaling rep.
cd /root/repo
JAR=target/scala-2.13/lucyjsspark_2.13-0.1.0.jar
OUT=BENCH/r5_campaign.jsonl
run() {
  local tag=$1 cpus=$2 docs=$3 phases=$4; shift 4
  mkdir -p /dev/shm/spark-local && rm -rf /dev/shm/spark-local/*
  local json
  json=$(env SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_DOCS=$docs SPARK_GRAFT_PHASES=$phases "$@" \
    /opt/spark/bin/spark-submit --class graft.Bench --master "local[$cpus]" \
      --driver-memory 40g "$JAR" 2>/dev/null | grep '^{"metric"' | tail -1)
  if [ -z "$json" ]; then
    # a crashed rep must not write malformed JSONL or masquerade as done
    echo "{\"tag\":\"$tag\",\"cpus\":$cpus,\"docs\":$docs,\"data\":null,\"error\":\"no bench output\"}" >> "$OUT"
    echo "$(date +%T) FAILED $tag (no bench output)" >&2
    return 1
  fi
  echo "{\"tag\":\"$tag\",\"cpus\":$cpus,\"docs\":$docs,\"data\":$json}" >> "$OUT"
  echo "$(date +%T) done $tag"
}
case "${1:-all}" in
  driver)  for i in 1 2 3; do run driver$i 32 300000 ABCDEFG; done ;;
  scaling) for i in 1 2 3; do run scale32_$i 32 2000000 ABCE; done
           for i in 1 2 3; do run scale8_$i 8 2000000 ABCE; done
           for i in 1 2; do run scale2_$i 2 2000000 ABCE; done ;;
  soaks)   run dedup_soak_1m 32 20000 H
           run store_soak_1m 32 20000 G SPARK_GRAFT_STORE_DOCS=1000000
           run ann_10m 32 20000 F SPARK_GRAFT_ANN_DOCS=10000000 ;;
  all)     "$0" driver; "$0" scaling; "$0" soaks ;;
esac
echo "CAMPAIGN ${1:-all} DONE"
