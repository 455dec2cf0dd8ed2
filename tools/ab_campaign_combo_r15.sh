#!/bin/bash
# r15/r16 shared-map-lever A/B campaign at the COMBINED 100x stage.
#
# Question (SCALE.md "Shared-map lever"): does disabling the per-query
# generated two-level fast hash map
# (-Dspark.sql.codegen.aggregate.map.twolevel.enabled=false) retire the
# intermittent resample starvation cliff at the combined stage, and at
# what steady-state cost? The preliminary 1-vs-1 the same afternoon
# read control 84.0/96.4 s (both passes cliffed) vs treatment
# 10.8/11.5 s, +2.6 % global steady-state — but ONE session per arm
# cannot adjudicate an intermittent rate (0-of-16 at ev100, 2-of-2 at
# combo the same day). This campaign alternates arms C,T,C,T,... so
# time-of-day drift loads both arms equally (the r14 design that
# properly rejected the recompile-cutoff mitigation).
#
# Arms: odd sessions = CONTROL (fast map ON, stock), even = TREATMENT
# (fast map OFF via SPARK_GRAFT_EXTRA_JVM -> SparkConf -> SQLConf).
# Every session: two-pass traced combo100 bench, jaccard-control
# recipe-skipped (standing), PrintCompilation armed so any cliff in
# EITHER arm is diagnosable, SLO armed with the known-clean treatment
# artifact leading (resample threshold 3x11.5 = 34.5 s — catches the
# 84-96 s class live) plus the committed control artifact for every
# other query. Session validity (r15 rule): joins BASE only if sbt
# exited 0 AND the artifact's "failed" list is empty.
# Run serially on an otherwise-idle machine; ~30 min/session.
set -u
cd /root/repo
N=${1:-8}
START=${2:-1}
OUT=${OUT:-/tmp/ab_combo_r15}
mkdir -p "$OUT"
BASE="forensics/campaign_r15/BENCH_FULL_graft_combo100_treat_nofastmap.json,BENCH_FULL_graft_combo100.json"
for i in $(seq "$START" "$N"); do
  if [ $((i % 2)) -eq 1 ]; then
    arm=ctl; FLAGS="-XX:+PrintCompilation"
  else
    arm=trt; FLAGS="-XX:+PrintCompilation -Dspark.sql.codegen.aggregate.map.twolevel.enabled=false"
  fi
  tag=$(printf 's%02d_%s' "$i" "$arm")
  echo "=== $tag start $(date +%H:%M:%S)" >> "$OUT/summary.log"
  if SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_combo100 \
    SPARK_GRAFT_BENCH_REPEAT=2 SPARK_GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_BENCH_SKIP=q_dedup_jaccard \
    SPARK_GRAFT_BENCH_BASELINE="$BASE" \
    SPARK_GRAFT_EXTRA_JVM="$FLAGS" \
    sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1 \
    && grep -q '"failed":\[\]' BENCH_FULL_graft_combo100.json; then
    cp BENCH_FULL_graft_combo100.json "$OUT/$tag.json"
    BASE="$BASE,$OUT/$tag.json"
    {
      python3 - "$OUT/$tag.json" "$tag" <<'PY'
import json, sys
a = json.load(open(sys.argv[1])); t = sys.argv[2]
q1 = a["queries"]["q_event_resample"]; q2 = a["queries_pass2"]["q_event_resample"]
print(f"{t} resample p1/p2 {q1:.1f}/{q2:.1f} totals {a['value']:.1f}/{a['total_pass2']:.1f}")
PY
      grep -c 'cliff-SLO breach' "$OUT/$tag.log" | sed "s/^/$tag breaches /"
      echo "=== $tag end $(date +%H:%M:%S)"
    } >> "$OUT/summary.log"
  else
    echo "=== $tag INVALID (bench abort or failed queries) $(date +%H:%M:%S)" \
      >> "$OUT/summary.log"
  fi
done
# leave the working tree's combo artifact as the committed CONTROL run
git checkout -- BENCH_FULL_graft_combo100.json 2>/dev/null || true
echo CAMPAIGN-DONE >> "$OUT/summary.log"
