#!/bin/bash
# Probe-gated bench capture — THE single gate entry point (r17 verdict
# #6 consolidated tools/bench_gate_r17.sh + bench_gate_r17b.sh, both
# now in forensics/). What changed vs r17b, and why:
#
# 1. Tri-state windows (r17 verdict #2). Ambient fsync on this host is
#    0.14-0.35 ms and never clears the 0.15 quiet gate twice in a row
#    (gate_r17b/c polled for hours), so the boolean stamped every
#    capture drifted and the old quiet-wait spent its whole deadline
#    waiting for a window that no longer exists. The gate now opens on
#    AMBIENT-or-better (fsync < 0.5 ms AND spin < 0.65 s, two
#    consecutive probes) and artifacts self-label quiet|ambient|drifted
#    via the same HostState thresholds; only `drifted` is excluded.
#
# 2. ONE capture loop instead of phases A/B (they had become identical
#    once every valid capture min-merges into the floor and competes
#    for the official slot). Each attempt: wait for an ambient window,
#    run REPEAT=3, merge into BENCH_NOISE.json, keep-best the official.
#
# 3. Keep-best by state rank then MEDIAN pass total (r17 ADVICE): the
#    r17b keep-best compared min-across-passes, making the official
#    headline the luckiest pass of the luckiest capture of an
#    overnight sweep — a floor-style order statistic presented as the
#    official. Min selection is reserved for the floor; the official
#    is the best capture by a representative statistic, and the kept
#    artifact is labeled `gate_selection` so the construction is
#    self-documenting. This also fixes the r17b phase-A quiet-branch
#    hole (ANY quiet capture replaced a better quiet official, and a
#    missing backup crashed the comparison): one comparison path, and
#    a missing incumbent simply means the new capture is kept.
#
# 4. After the LAST merge, the kept official's embedded floor block is
#    re-emitted against the merged floor (bench_artifact.py
#    restamp-floor) — r17b wrote the artifact (block computed vs the
#    pre-merge floor) and THEN merged, so every committed
#    artifact/floor pair disagreed (0.979 self-label vs 1.024
#    recomputed). The block's sha256 field pins exactly which floor
#    file the ratios divide by.
#
# 5. Floor merges refuse cross-tree captures by recorded identity
#    (timed_path_sha preferred, git_head fallback; missing/dirty =
#    refusal — see tools/floor_merge.py). GATE_FLOOR_CROSS_TREE=1
#    passes --allow-cross-tree: set it only when every timed-path edit
#    since the floor's identity is known neutral, and record why in
#    SCALE.md.
#
# Usage: nohup tools/bench_gate.sh > forensics/gate_r18/nohup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${GATE_OUT:-forensics/gate_r18}
mkdir -p "$OUT"
GATE_FSYNC_MS=${GATE_FSYNC_MS:-0.5}    # ambient bound (HostState)
GATE_SPIN_S=${GATE_SPIN_S:-0.65}
POLL_S=${POLL_S:-90}
DEADLINE_S=${DEADLINE_S:-13500}
SWEEP_ATTEMPTS=${SWEEP_ATTEMPTS:-2}    # valid captures to sweep over
START_TS=$(date +%s)
log() { echo "[gate $(date +%H:%M:%S)] $*" >> "$OUT/gate.log"; }

# Prints "spin_s fsync_ms" from one rep of the JVM probe (~1.5 s) —
# byte-identical signals to the artifact's own stamp predicate.
probe_jvm() {
  java tools/HostProbeJvm.java 1 2>/dev/null \
    | sed -n 's/.*spin_s=\([0-9.]*\) fsync_ms=\([0-9.]*\).*/\1 \2/p'
}

past_deadline() { [ $(($(date +%s) - START_TS)) -ge "$DEADLINE_S" ]; }

# Wait for two consecutive ambient-or-better probes POLL_S apart (a
# single good blip inside a churn episode must not trigger an 8-minute
# capture). Returns 0 = window open, 1 = deadline (caller runs ungated).
wait_window() {
  local streak=0 s f
  while true; do
    read -r s f < <(probe_jvm)
    if [ -z "${s:-}" ] || [ -z "${f:-}" ]; then
      log "probe FAILED to parse — treating as loud"
      s=99; f=99
    fi
    log "probe spin_s=$s fsync_ms=$f (streak=$streak, gate spin<$GATE_SPIN_S fsync<$GATE_FSYNC_MS)"
    if python3 -c "import sys; sys.exit(0 if float('$s') < float('$GATE_SPIN_S') and float('$f') < float('$GATE_FSYNC_MS') else 1)"; then
      streak=$((streak + 1))
      [ "$streak" -ge 2 ] && { log "ambient-or-better window open"; return 0; }
    else
      streak=0
    fi
    if past_deadline; then
      log "deadline passed with no usable window — proceeding ungated"
      return 1
    fi
    sleep "$POLL_S"
  done
}

state_of()  { python3 tools/bench_artifact.py state "$1" 2>/dev/null || echo drifted; }
median_of() { python3 tools/bench_artifact.py median-total "$1" 2>/dev/null || echo 999999; }
rank_of() {
  case "$(state_of "$1")" in
    quiet) echo 0 ;; ambient) echo 1 ;; *) echo 2 ;;
  esac
}

# run_bench <tag> <sfdir> <repeat> <artifact>
# Exit 0 only if the bench succeeded (no aborted context, no failed
# queries, artifact freshly written). Every valid sf0.1 capture
# min-merges into the floor (merge can only lower entries).
run_bench() {
  local tag=$1 sfdir=$2 repeat=$3 artifact=$4
  rm -f "$artifact"   # staleness guard: a prior artifact must never validate this run
  log "$tag: bench start (sf=$sfdir repeat=$repeat)"
  if SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$sfdir" \
     SPARK_GRAFT_BENCH_REPEAT="$repeat" \
     sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1 \
     && [ -f "$artifact" ] \
     && python3 -c "import json,sys; sys.exit(0 if json.load(open('$artifact')).get('failed')==[] else 1)"; then
    cp "$artifact" "$OUT/$tag.json"
    log "$tag: bench done, state=$(state_of "$artifact"), median_total=$(median_of "$artifact")"
    if [ "$artifact" = BENCH_FULL.json ]; then
      python3 tools/floor_merge.py BENCH_NOISE.json "$OUT/$tag.json" \
        ${GATE_FLOOR_CROSS_TREE:+--allow-cross-tree} >> "$OUT/gate.log" 2>&1 \
        || log "$tag: floor merge REFUSED (identity mismatch) — floor unchanged"
    fi
    return 0
  fi
  log "$tag: bench INVALID (abort or failed queries) — see $OUT/$tag.log"
  return 1
}

# keep_best <incumbent> <challenger> — 0 if the challenger wins.
# TREE IDENTITY first (r18 optimization round): an incumbent whose
# timed_path_sha differs from the challenger's is a capture of CODE
# THAT NO LONGER EXISTS at HEAD — its median is not comparable (it
# conflates host drift with the code change), and letting it block
# every current-tree capture would leave the committed official
# describing a stale tree forever. A current-tree challenger therefore
# beats a cross-tree incumbent unconditionally; within the same tree,
# state rank (quiet > ambient > drifted), then median pass total.
# A missing incumbent never crashes the comparison: challenger wins.
sha_of() {
  python3 -c "import json;print(json.load(open('$1')).get('timed_path_sha','unknown'))" \
    2>/dev/null || echo unknown
}
keep_best() {
  local inc=$1 ch=$2
  [ -f "$inc" ] || return 0
  if [ "$(sha_of "$inc")" != "$(sha_of "$ch")" ]; then
    log "keep-best: incumbent is cross-tree ($(sha_of "$inc") != $(sha_of "$ch")) — current-tree capture adopted"
    return 0
  fi
  local ri rc2
  ri=$(rank_of "$inc"); rc2=$(rank_of "$ch")
  if [ "$rc2" -lt "$ri" ]; then return 0; fi
  if [ "$rc2" -gt "$ri" ]; then return 1; fi
  python3 -c "import sys; sys.exit(0 if float('$(median_of "$ch")') < float('$(median_of "$inc")') else 1)"
}

# ---- Sweep: capture, merge, keep-best ---------------------------------
valid=0
attempt=0
official_changed=0
while [ "$valid" -lt "$SWEEP_ATTEMPTS" ]; do
  attempt=$((attempt + 1))
  wait_window; gated=$?
  tag=$(printf 'S%02d_sweep' "$attempt")
  cp BENCH_FULL.json "$OUT/BENCH_FULL.incumbent.json" 2>/dev/null || true
  if run_bench "$tag" /root/testdata/sf0.1 3 BENCH_FULL.json; then
    valid=$((valid + 1))
    if keep_best "$OUT/BENCH_FULL.incumbent.json" BENCH_FULL.json; then
      official_changed=1
      log "$tag: kept as official (state=$(state_of BENCH_FULL.json), median=$(median_of BENCH_FULL.json))"
    else
      cp "$OUT/BENCH_FULL.incumbent.json" BENCH_FULL.json
      log "$tag: incumbent retained (challenger state=$(state_of "$OUT/$tag.json"), median=$(median_of "$OUT/$tag.json"))"
    fi
  else
    # invalid run: run_bench pre-deleted the artifact — put the
    # incumbent official back so the tree never holds a gap or a
    # half-written capture (r17 ADVICE: the r17b no-backup path left
    # a drifted capture in place by accident)
    cp "$OUT/BENCH_FULL.incumbent.json" BENCH_FULL.json 2>/dev/null || true
  fi
  if past_deadline && [ "$valid" -ge 1 ]; then
    log "deadline passed with $valid valid capture(s) — ending sweep"
    break
  fi
  if past_deadline && [ "$attempt" -ge $((SWEEP_ATTEMPTS + 3)) ]; then
    log "deadline passed with NO valid capture after $attempt attempts — giving up"
    break
  fi
done

# ---- Post-sweep: restamp the kept official against the merged floor ---
if [ -f BENCH_FULL.json ]; then
  python3 tools/bench_artifact.py restamp-floor --floor BENCH_NOISE.json \
    BENCH_FULL.json >> "$OUT/gate.log" 2>&1 \
    && log "official floor block restamped against merged BENCH_NOISE.json"
  # Only (re)label the selection when a challenger actually won this
  # run — a retained incumbent keeps the label of the sweep that
  # selected it (relabeling it with THIS run's smaller count would
  # misstate the official's construction).
  if [ "$official_changed" -eq 1 ]; then
    python3 tools/bench_artifact.py label BENCH_FULL.json gate_selection \
      "best-of-$valid-capture sweep by state rank (quiet>ambient>drifted) then median pass total; floor block restamped post-merge" \
      >> "$OUT/gate.log" 2>&1
  fi
  cp BENCH_FULL.json BENCH_FULL_sf0.1.json
fi

# ---- ev100 stream-lane recipe corroboration ---------------------------
if [ -d /tmp/graft_ev100 ] && [ "${GATE_SKIP_EV100:-0}" != 1 ]; then
  attempt=0
  ev_done=0
  while [ "$ev_done" -eq 0 ]; do
    attempt=$((attempt + 1))
    wait_window; gated=$?
    tag=$(printf 'E%02d_ev100' "$attempt")
    export SPARK_GRAFT_BENCH_TRACE=1
    export SPARK_GRAFT_BENCH_BASELINE=forensics/BENCH_FULL_graft_ev100_clean_seed_r15.json
    if run_bench "$tag" /tmp/graft_ev100 2 BENCH_FULL_graft_ev100.json; then
      st=$(state_of BENCH_FULL_graft_ev100.json)
      if [ "$st" != drifted ] || [ "$gated" -eq 1 ]; then
        log "ev100 corroboration captured (state=$st)"
        ev_done=1
      else
        log "ev100: window closed mid-run (state=$st) — retrying"
      fi
    elif past_deadline; then
      log "ev100: giving up (invalid run past deadline)"
      ev_done=1
    fi
  done
else
  log "ev100 phase skipped: /tmp/graft_ev100 not staged or GATE_SKIP_EV100=1"
fi
log "GATE-DONE"
