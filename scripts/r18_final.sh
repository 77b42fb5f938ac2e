#!/bin/bash
# Round-18 optimization-round FINAL gates chain: full tests + oracle +
# PlanAudit at the final HEAD, bench min-of-3 at sf0.1, slope probe, and the
# all-queries x10/x20 sweeps. Assets wiped first so tests/Verify exercise the
# build path and the bench runs exercise the load path (round-16 discipline).
set -u
cd /root/repo
echo "=== R18FINAL start $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"
rm -rf /root/.cache/graft_assets
sbt -batch test > /tmp/test_r18_final.log 2>&1
echo "TEST=$? $(date +%T)"
rm -rf /tmp/vout_r18f
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_r18f" > /tmp/verify_r18_final.log 2>&1
echo "VERIFY=$? $(date +%T)"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vout_r18f > /tmp/oracle_r18_final.log 2>&1
echo "ORACLE=$? $(date +%T)"
sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r18.log 2>&1
echo "PLANAUDIT=$? $(date +%T)"
for i in 1 2 3; do
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_r18_run$i.txt 2>&1
  echo "BENCH$i=$? $(date +%T)"
done
SPARK_GRAFT_CPUS=24 sbt -batch "runMain graft.SlopeProbe" > /tmp/slope_r18.out 2>/tmp/slope_r18.err
echo "SLOPE=$? $(date +%T)"
SPARK_GRAFT_SCALE_QUERIES=all SPARK_GRAFT_CPUS=24 \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scale10_r18.out 2>/tmp/scale10_r18.err
echo "S10=$? $(date +%T)"
SPARK_GRAFT_SCALE_QUERIES=all SPARK_GRAFT_CPUS=24 SPARK_GRAFT_TILES=20 \
  SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf2 \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scale20_r18.out 2>/tmp/scale20_r18.err
echo "S20=$? $(date +%T)"
echo "=== R18FINAL done $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"
