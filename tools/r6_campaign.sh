#!/bin/bash
# r6 bench campaign: driver-shape best-of (43 harness entries), N->4N
# scaling evidence, and the r6 qualification soaks from the VERDICT r5
# punch list — dedup soak at 1M AND 2M docs (clusters-stage scaling
# after the primitive union-find, #5; simhash wide-radius recall at
# soak scale, #2), 1M-doc store soak (warm-behind + shuffle-free
# composite stats, #6), 50M-vector ivf2 probe sweep (#4), and the
# dedup-pairs multi-probe soak at 1M vectors (phase I, #3).
# Runs Bench via spark-submit on the packaged jar (no sbt lock).
# Reps run STRICTLY sequentially — never overlap a scaling rep.
cd /root/repo
JAR=target/scala-2.13/lucyjsspark_2.13-0.1.0.jar
OUT=BENCH/r6_campaign.jsonl
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
           run dedup_soak_2m 32 20000 H SPARK_GRAFT_DEDUP_DOCS=1999998 SPARK_GRAFT_DEDUP_MEGA=40000
           run store_soak_1m 32 20000 G SPARK_GRAFT_STORE_DOCS=1000000
           run embdedup_1m 32 20000 I SPARK_GRAFT_EMBDEDUP_PAIRS=500000
           run ann_50m_ivf2sweep 32 20000 F SPARK_GRAFT_ANN_DOCS=50000000 \
             SPARK_GRAFT_IVF2_SWEEP=21x21,26x26,32x32,42x42,42x21,21x42
           ;;
  all)     "$0" driver; "$0" scaling; "$0" soaks ;;
esac
echo "CAMPAIGN ${1:-all} DONE"
