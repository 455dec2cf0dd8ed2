#!/bin/bash
# r15 cliff-rate campaign under the ACTIVATION-BOUNDED resample shape
# (r14 verdict directive 1): N single-arm ev100 bench sessions, every
# session two-pass, traced, PrintCompilation armed so any residual
# cliff instance is diagnosable. The r14 campaign adjudicated the
# mechanism (activation-level tier starvation, ~50%/session cliff rate
# on the OLD 32-giant-partition shape, 48-207s observed); the r14 fix
# bounds each activation to ~1/waves of the stage (waves=6 at ev100).
# This campaign measures the RATE under full-bench codegen churn --
# the r14 zero-cliff evidence was 20 low-churn QTime repeats, and the
# structural claim is only the ~1/waves bound (predicted worst ~40s).
#
# SLO seeding (r15 ADVICE): BASE leads with a KNOWN-CLEAN artifact
# (forensics/BENCH_FULL_graft_ev100_clean_seed_r15.json, the r14
# bounded-shape worst-of-20 = 6.3s) so session 1 is already armed with
# a 18.9s resample threshold -- the r14 campaign's first sessions ran
# with a ~146s threshold because only cliff-bearing artifacts were
# seeded, and its "every cliff caught live" claim held only because
# s01-s03 happened to be clean. The historical ev100 artifact stays in
# the list for every OTHER query's threshold.
#
# Session validity (r15): a session joins BASE only if sbt exited 0
# AND the artifact's "failed" list is empty. The campaign's first
# attempt had a storage OOM kill the SparkContext at query 60/166 and
# the dead session's 5 ms no-op "timings" would have floored half the
# SLO thresholds for every later session (the 5 s floor capped most of
# the damage, but >5 s queries false-breached). graft.Bench now exits
# 3 on a stopped context without writing an artifact; this guard is
# the script-side belt to that suspender.
# Run serially on an otherwise-idle machine; ~18 min/session.
set -u
cd /root/repo
N=${1:-8}
START=${2:-1}
OUT=${OUT:-/tmp/campaign_r15}
mkdir -p "$OUT"
BASE="forensics/BENCH_FULL_graft_ev100_clean_seed_r15.json,BENCH_FULL_graft_ev100.json"
FLAGS="-XX:+PrintCompilation"
for i in $(seq "$START" "$N"); do
  tag=$(printf 's%02d_bnd' "$i")
  echo "=== $tag start $(date +%H:%M:%S)" >> "$OUT/summary.log"
  if SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_ev100 \
    SPARK_GRAFT_BENCH_REPEAT=2 SPARK_GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_BENCH_BASELINE="$BASE" \
    SPARK_GRAFT_EXTRA_JVM="$FLAGS" \
    sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1 \
    && grep -q '"failed":\[\]' BENCH_FULL_graft_ev100.json; then
    cp BENCH_FULL_graft_ev100.json "$OUT/$tag.json"
    BASE="$BASE,$OUT/$tag.json"
    {
      grep -o '"q_event_resample": [0-9.]*' "$OUT/$tag.json" | sed "s/^/$tag /"
      grep -c 'cliff-SLO breach' "$OUT/$tag.log" | sed "s/^/$tag breaches /"
      echo "=== $tag end $(date +%H:%M:%S)"
    } >> "$OUT/summary.log"
  else
    echo "=== $tag INVALID (bench abort or failed queries) $(date +%H:%M:%S)" \
      >> "$OUT/summary.log"
  fi
done
echo CAMPAIGN-DONE >> "$OUT/summary.log"
