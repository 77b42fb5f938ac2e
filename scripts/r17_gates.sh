#!/bin/bash
# Round-17 final-gates chain on final HEAD: tests, sf0.01 verify+oracle,
# plan audit (fail-exit), min-of-3 bench at sf0.1, slope probe, and the
# two full-surface scale sweeps.
set -u
cd /root/repo
echo "=== GATES start $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"

# The persisted asset layer is exercised BOTH ways in this chain — a fresh
# asset root means the test and Verify stages BUILD artifacts, the bench
# runs then LOAD them (run 1 builds the sf0.1 artifacts, runs 2-3 load).
# Round 17: the default root moved to the user-owned ~/.cache/graft_assets
# (AssetStore.defaultRoot); Bench now stamps asset_builds_n/asset_build_sec
# so the build cost is recorded, not erased. Scale probes pin assets OFF.
rm -rf /root/.cache/graft_assets /tmp/graft_assets
# NOTE: /tmp/graft_sf1 and /tmp/graft_sf2 were re-tiled from the CURRENT
# round's testdata immediately before this chain launched (the driver
# regenerates testdata between rounds and ensureTiled's marker does not
# track the source); the chain reuses those fresh tiles.

sbt -batch test > /tmp/test_r17.log 2>&1
echo "TEST=$? $(date +%T)"

sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_r17" > /tmp/verify001_r17.log 2>&1
echo "VERIFY001=$? $(date +%T)"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vout_r17 > /tmp/oracle001_r17.log 2>&1
echo "ORACLE001=$? $(date +%T)"

# Plan-shape regression gate: PlanAudit exits 1 on any MISSING/CHECK line.
sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r17.log 2>&1
echo "PLANAUDIT=$? $(date +%T)"

for i in 1 2 3; do
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_r17_run$i.txt 2>&1
  echo "BENCH$i=$? $(date +%T)"
done

SPARK_GRAFT_CPUS=24 sbt -batch "runMain graft.SlopeProbe" > /tmp/slope_r17.out 2>/tmp/slope_r17.err
echo "SLOPE=$? $(date +%T)"

SPARK_GRAFT_SCALE_QUERIES=all SPARK_GRAFT_CPUS=24 \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scale10_r17.out 2>/tmp/scale10_r17.err
echo "S10=$? $(date +%T)"

SPARK_GRAFT_SCALE_QUERIES=all SPARK_GRAFT_CPUS=24 SPARK_GRAFT_TILES=20 \
  SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf2 \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scale20_r17.out 2>/tmp/scale20_r17.err
echo "S20=$? $(date +%T)"

echo "=== GATES done $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)"
