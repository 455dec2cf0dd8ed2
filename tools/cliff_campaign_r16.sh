#!/bin/bash
# r16 scoped shared-map campaign (r15 verdict directive 2): adjudicate
# `spark.graft.resample.fastMapOff` — the child-session lever that
# routes ONLY q_event_resample through the shared BytesToBytesMap
# aggregate path (every r13-r15 cliff capture starves in the per-query
# generated fast map's findOrInsert; the shared map is profile-hot
# JVM-wide and has no per-query nmethod to starve).
#
# Design: alternating arms C,T,C,T (odd=ctl stock, even=trt knob ON) so
# host drift cannot masquerade as an arm effect (the r15 A/B learned
# this the hard way); each session a fresh JVM, two-pass traced ev100
# bench, PrintCompilation armed. Arms keep SEPARATE SLO baseline
# accumulators: the threshold is 3x the MIN worst-pass across
# artifacts, and the treatment's steady resample is ~2x the control's,
# so a shared accumulator would false-breach every treatment pass once
# a control artifact joined. Both arms seed from the r15 clean-seed
# (6.3 s resample -> 18.9 s threshold) plus the historical ev100
# artifact for every other query.
#
# Session validity (r15): admitted to BASE only if sbt exited 0 AND the
# artifact's "failed" list is empty (graft.Bench exits 3 on a dead
# SparkContext without writing an artifact; this is the script belt).
# Run serially on an otherwise-idle machine; ~18 min/session.
set -u
cd /root/repo
N=${1:-14}
START=${2:-1}
OUT=${OUT:-/tmp/campaign_r16}
mkdir -p "$OUT"
SEED="forensics/BENCH_FULL_graft_ev100_clean_seed_r15.json,BENCH_FULL_graft_ev100.json"
BASE_CTL="$SEED"
BASE_TRT="$SEED"
for i in $(seq "$START" "$N"); do
  if [ $((i % 2)) -eq 1 ]; then
    arm=ctl; FLAGS="-XX:+PrintCompilation"; BASE="$BASE_CTL"
  else
    arm=trt
    FLAGS="-XX:+PrintCompilation -Dspark.graft.resample.fastMapOff=true"
    BASE="$BASE_TRT"
  fi
  tag=$(printf 's%02d_%s' "$i" "$arm")
  echo "=== $tag start $(date +%H:%M:%S)" >> "$OUT/summary.log"
  # staleness guard (r16 ADVICE): if a future Bench path ever exits 0
  # without rewriting the artifact, the PREVIOUS session's file must not
  # validate and get admitted to the baseline as this session's data
  rm -f BENCH_FULL_graft_ev100.json
  if SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_ev100 \
    SPARK_GRAFT_BENCH_REPEAT=2 SPARK_GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_BENCH_BASELINE="$BASE" \
    SPARK_GRAFT_EXTRA_JVM="$FLAGS" \
    sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1 \
    && grep -q '"failed":\[\]' BENCH_FULL_graft_ev100.json; then
    cp BENCH_FULL_graft_ev100.json "$OUT/$tag.json"
    if [ "$arm" = ctl ]; then BASE_CTL="$BASE_CTL,$OUT/$tag.json"
    else BASE_TRT="$BASE_TRT,$OUT/$tag.json"; fi
    {
      grep -o '"q_event_resample": [0-9.]*' "$OUT/$tag.json" | sed "s/^/$tag /"
      grep -o '"total[_a-z0-9]*":[0-9.]*' "$OUT/$tag.json" | head -2 | sed "s/^/$tag /"
      grep -c 'cliff-SLO breach' "$OUT/$tag.log" | sed "s/^/$tag breaches /"
      grep -o '"p[a-z]*_fsync_ms":[0-9.]*' "$OUT/$tag.json" | sed "s/^/$tag /"
      echo "=== $tag end $(date +%H:%M:%S)"
    } >> "$OUT/summary.log"
  else
    echo "=== $tag INVALID (bench abort or failed queries) $(date +%H:%M:%S)" \
      >> "$OUT/summary.log"
  fi
done
echo CAMPAIGN-DONE >> "$OUT/summary.log"
