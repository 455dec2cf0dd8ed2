#!/bin/bash
# r14 OSR-cliff mitigation campaign (r13 verdict directive 1):
# 12 alternating ev100 bench sessions — 6 with the raised recompilation
# cutoffs (treatment, "cut"), 6 without (control, "ctl") — every session
# two-pass, traced, PrintCompilation armed so any cliff instance is
# diagnosable, SLO armed from the curated multi-artifact baseline (each
# finished session's artifact joins the baseline; the first clean one
# anchors the resample threshold at 3x-clean).
# Run serially on an otherwise-idle machine; ~18 min/session.
set -u
cd /root/repo
OUT=/tmp/campaign_r14
mkdir -p "$OUT"
BASE="BENCH_FULL_graft_ev100.json,forensics/BENCH_FULL_graft_ev100_102s_cliff_run_r13.json"
CUTFLAGS="-XX:+PrintCompilation -XX:PerMethodRecompilationCutoff=1000 -XX:PerBytecodeRecompilationCutoff=500"
CTLFLAGS="-XX:+PrintCompilation"
for i in $(seq 1 12); do
  if [ $((i % 2)) -eq 1 ]; then arm=cut; FLAGS="$CUTFLAGS"; else arm=ctl; FLAGS="$CTLFLAGS"; fi
  tag=$(printf 's%02d_%s' "$i" "$arm")
  echo "=== $tag start $(date +%H:%M:%S)" >> "$OUT/summary.log"
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_ev100 \
    SPARK_GRAFT_BENCH_REPEAT=2 SPARK_GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_BENCH_BASELINE="$BASE" \
    SPARK_GRAFT_EXTRA_JVM="$FLAGS" \
    sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1
  cp BENCH_FULL_graft_ev100.json "$OUT/$tag.json"
  BASE="$BASE,$OUT/$tag.json"
  {
    grep -o '"q_event_resample": [0-9.]*' "$OUT/$tag.json" | sed "s/^/$tag /"
    grep -c 'cliff-SLO breach' "$OUT/$tag.log" | sed "s/^/$tag breaches /"
    echo "=== $tag end $(date +%H:%M:%S)"
  } >> "$OUT/summary.log"
done
echo CAMPAIGN-DONE >> "$OUT/summary.log"
