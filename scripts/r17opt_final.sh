#!/bin/bash
# Round-17 optimization-round FINAL chain (trimmed: test+Verify+oracle already
# ran green on this HEAD this session - /tmp/test_memo.log 252/252,
# /tmp/oracle_memo.log 163/163).
set -u
cd /root/repo
echo "=== OPTFINAL start $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"
sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r17opt.log 2>&1
echo "PLANAUDIT=$? $(date +%T)"
for i in 2 3; do
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_r17opt_run$i.txt 2>&1
  echo "BENCH$i=$? $(date +%T)"
done
SPARK_GRAFT_CPUS=24 sbt -batch "runMain graft.SlopeProbe" > /tmp/slope_r17opt.out 2>/tmp/slope_r17opt.err
echo "SLOPE=$? $(date +%T)"
SPARK_GRAFT_SCALE_QUERIES=all SPARK_GRAFT_CPUS=24 \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scale10_r17opt.out 2>/tmp/scale10_r17opt.err
echo "S10=$? $(date +%T)"
SPARK_GRAFT_SCALE_QUERIES=all SPARK_GRAFT_CPUS=24 SPARK_GRAFT_TILES=20 \
  SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf2 \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scale20_r17opt.out 2>/tmp/scale20_r17opt.err
echo "S20=$? $(date +%T)"
echo "=== OPTFINAL done $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"
