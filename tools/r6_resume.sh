#!/bin/bash
# Resume the r6 campaign after the driver session died mid-run:
# r6_campaign.jsonl already holds driver1-3 + scale32_1,2.
cd /root/repo
# (ADVICE r6 #5: the old `. tools/r6_campaign.sh_lib` source line was a
# dead reference — run() below is the real, self-contained helper.)
run() {
  local tag=$1 cpus=$2 docs=$3 phases=$4; shift 4
  mkdir -p /dev/shm/spark-local && rm -rf /dev/shm/spark-local/*
  local json
  json=$(env SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_DOCS=$docs SPARK_GRAFT_PHASES=$phases "$@" \
    /opt/spark/bin/spark-submit --class graft.Bench --master "local[$cpus]" \
      --driver-memory 40g target/scala-2.13/lucyjsspark_2.13-0.1.0.jar 2>/dev/null | grep '^{"metric"' | tail -1)
  if [ -z "$json" ]; then
    echo "{\"tag\":\"$tag\",\"cpus\":$cpus,\"docs\":$docs,\"data\":null,\"error\":\"no bench output\"}" >> BENCH/r6_campaign.jsonl
    echo "$(date +%T) FAILED $tag (no bench output)" >&2
    return 1
  fi
  echo "{\"tag\":\"$tag\",\"cpus\":$cpus,\"docs\":$docs,\"data\":$json}" >> BENCH/r6_campaign.jsonl
  echo "$(date +%T) done $tag"
}
run scale32_3 32 2000000 ABCE
for i in 1 2 3; do run scale8_$i 8 2000000 ABCE; done
for i in 1 2; do run scale2_$i 2 2000000 ABCE; done
run dedup_soak_1m 32 20000 H
run dedup_soak_2m 32 20000 H SPARK_GRAFT_DEDUP_DOCS=1999998 SPARK_GRAFT_DEDUP_MEGA=40000
run store_soak_1m 32 20000 G SPARK_GRAFT_STORE_DOCS=1000000
run embdedup_1m 32 20000 I SPARK_GRAFT_EMBDEDUP_PAIRS=500000
run ann_50m_ivf2sweep 32 20000 F SPARK_GRAFT_ANN_DOCS=50000000 \
  SPARK_GRAFT_IVF2_SWEEP=21x21,26x26,32x32,42x42,42x21,21x42
echo "RESUME DONE"
