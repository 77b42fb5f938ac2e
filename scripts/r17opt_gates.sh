#!/bin/bash
# Round-17 OPTIMIZATION-round gates chain: same stages as r17_final.sh, fresh
# asset root so test/Verify exercise the build path, distinct log names.
set -u
cd /root/repo
echo "=== OPT start $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"

rm -rf /root/.cache/graft_assets /tmp/graft_assets

sbt -batch test > /tmp/test_r17opt.log 2>&1
echo "TEST=$? $(date +%T)"

sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_r17opt" > /tmp/verify_r17opt.log 2>&1
echo "VERIFY001=$? $(date +%T)"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vout_r17opt > /tmp/oracle_r17opt.log 2>&1
echo "ORACLE001=$? $(date +%T)"

sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r17opt.log 2>&1
echo "PLANAUDIT=$? $(date +%T)"

for i in 1 2 3; do
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

echo "=== OPT done $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"
