#!/bin/bash
# Probe-gated official bench capture (r16 verdict directives 1, 2, 5).
#
# Two rounds running, the official sf0.1 artifact was captured into a
# drifted host window (r15 1.6x floor, r16 1.17x) despite best-window
# effort — "pick a quiet-looking moment and hope" does not converge on
# this box (shared hypervisor; guest load reads ~0 while wall-clock
# inflates). This script inverts the procedure: POLL the host probe and
# only start a timed capture when two consecutive probes read quiet;
# re-check the capture's own in-artifact probe fields afterwards and
# retry if the window closed mid-run. If no quiet window appears before
# the deadline, run the remaining phases anyway — graft.Bench now
# self-stamps `"drifted":true` from its own probes, so the artifact
# auto-excludes instead of needing adjudication prose.
#
# Phases (each independently quiet-gated, in order):
#   A  refresh BENCH_NOISE.json      REPEAT=3 sf0.1; replaces the floor
#                                    ONLY if the artifact reads quiet
#   B  official BENCH_FULL.json      REPEAT=3 sf0.1; carries floor
#                                    ratios vs A's refreshed floor
#   C  ev100 recipe corroboration    REPEAT=2 /tmp/graft_ev100; quiet
#                                    re-stamp of SCALE.md's stream-lane
#                                    recipe table (r16 directive 5)
#
# Gate signal: fsync latency on /tmp (quiet ~0.05 ms; every recorded
# drift episode >=0.23 ms). The spin is logged but not gated on — the
# r16 driver capture probed post_spin 1.27 s (near quiet) beside an
# 11 ms fsync, so fsync is the discriminating signal pre-run; the
# artifact's own stamp still checks both.
#
# Usage: nohup tools/bench_gate_r17.sh > forensics/gate_r17/nohup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=forensics/gate_r17
mkdir -p "$OUT"
GATE_FSYNC_MS=${GATE_FSYNC_MS:-0.10}
POLL_S=${POLL_S:-120}
DEADLINE_S=${DEADLINE_S:-14400}   # stop waiting for quiet after 4 h
START_TS=$(date +%s)
log() { echo "[gate $(date +%H:%M:%S)] $*" >> "$OUT/gate.log"; }

probe_fsync() {
  python3 - <<'EOF'
import os, tempfile, time
fd, path = tempfile.mkstemp(suffix=".bin", prefix="graft_gate_", dir="/tmp")
try:
    buf = b"\0" * 4096
    t0 = time.perf_counter()
    for _ in range(50):
        os.pwrite(fd, buf, 0)
        os.fsync(fd)
    print(f"{(time.perf_counter() - t0) * 1e3 / 50:.4f}")
finally:
    os.close(fd)
    os.unlink(path)
EOF
}

past_deadline() { [ $(($(date +%s) - START_TS)) -ge "$DEADLINE_S" ]; }

# Wait for two consecutive quiet probes POLL_S apart (a single quiet
# blip inside a churn episode must not trigger an 8-minute capture).
# Returns 0 = quiet window, 1 = deadline passed (caller runs ungated).
wait_quiet() {
  local streak=0 f
  while true; do
    f=$(probe_fsync)
    log "probe fsync_ms=$f (streak=$streak, gate<$GATE_FSYNC_MS)"
    if python3 -c "import sys; sys.exit(0 if float('$f') < float('$GATE_FSYNC_MS') else 1)"; then
      streak=$((streak + 1))
      [ "$streak" -ge 2 ] && { log "quiet window open"; return 0; }
    else
      streak=0
    fi
    if past_deadline; then
      log "deadline passed with no quiet window — proceeding ungated"
      return 1
    fi
    sleep "$POLL_S"
  done
}

# run_bench <tag> <sfdir> <repeat> <artifact>
# Exit 0 only if the bench succeeded (no aborted context, no failed
# queries, artifact freshly written). Quietness is judged separately
# from the artifact's own "drifted" stamp.
run_bench() {
  local tag=$1 sfdir=$2 repeat=$3 artifact=$4
  rm -f "$artifact"   # staleness guard: a prior artifact must never validate this run
  log "$tag: bench start (sf=$sfdir repeat=$repeat)"
  if SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$sfdir" \
     SPARK_GRAFT_BENCH_REPEAT="$repeat" \
     sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1 \
     && [ -f "$artifact" ] && grep -q '"failed":\[\]' "$artifact"; then
    cp "$artifact" "$OUT/$tag.json"
    log "$tag: bench done, $(grep -o '"drifted":[a-z]*' "$artifact"), $(grep -o '"value":[0-9.]*' "$artifact" | head -1)"
    return 0
  fi
  log "$tag: bench INVALID (abort or failed queries) — see $OUT/$tag.log"
  return 1
}

artifact_quiet() { grep -q '"drifted":false' "$1"; }

# ---- Phase A: refresh the noise floor --------------------------------
attempt=0
floor_done=0
while [ "$floor_done" -eq 0 ]; do
  attempt=$((attempt + 1))
  wait_quiet; gated=$?
  tag=$(printf 'A%02d_floor' "$attempt")
  if run_bench "$tag" /root/testdata/sf0.1 3 BENCH_FULL.json; then
    if artifact_quiet BENCH_FULL.json; then
      cp BENCH_FULL.json BENCH_NOISE.json
      log "phase A: floor REFRESHED (quiet, probe-backed)"
      floor_done=1
    elif [ "$gated" -eq 1 ]; then
      log "phase A: deadline + drifted — keeping the standing floor, attempt saved"
      floor_done=1   # do NOT replace the floor with a drifted capture
    else
      log "phase A: window closed mid-run (drifted stamp) — retrying"
    fi
  elif past_deadline; then
    log "phase A: giving up (invalid run past deadline)"
    floor_done=1
  fi
done

# ---- Phase B: official sf0.1 capture ---------------------------------
attempt=0
official_done=0
while [ "$official_done" -eq 0 ]; do
  attempt=$((attempt + 1))
  wait_quiet; gated=$?
  tag=$(printf 'B%02d_official' "$attempt")
  if run_bench "$tag" /root/testdata/sf0.1 3 BENCH_FULL.json; then
    if artifact_quiet BENCH_FULL.json || [ "$gated" -eq 1 ]; then
      log "phase B: official captured ($(grep -o '"drifted":[a-z]*' BENCH_FULL.json))"
      official_done=1
    else
      log "phase B: window closed mid-run — retrying"
    fi
  elif past_deadline; then
    log "phase B: giving up (invalid run past deadline)"
    official_done=1
  fi
done

# ---- Phase C: ev100 stream-lane recipe corroboration ------------------
if [ -d /tmp/graft_ev100 ]; then
  attempt=0
  ev_done=0
  while [ "$ev_done" -eq 0 ]; do
    attempt=$((attempt + 1))
    wait_quiet; gated=$?
    tag=$(printf 'C%02d_ev100' "$attempt")
    # trace + armed SLO: the corroboration run should self-report
    # "breaches 0" against the r15 clean seed, like the campaigns did
    export SPARK_GRAFT_BENCH_TRACE=1
    export SPARK_GRAFT_BENCH_BASELINE=forensics/BENCH_FULL_graft_ev100_clean_seed_r15.json
    if run_bench "$tag" /tmp/graft_ev100 2 BENCH_FULL_graft_ev100.json; then
      if artifact_quiet BENCH_FULL_graft_ev100.json || [ "$gated" -eq 1 ]; then
        log "phase C: ev100 corroboration captured ($(grep -o '"drifted":[a-z]*' BENCH_FULL_graft_ev100.json))"
        ev_done=1
      else
        log "phase C: window closed mid-run — retrying"
      fi
    elif past_deadline; then
      log "phase C: giving up (invalid run past deadline)"
      ev_done=1
    fi
  done
else
  log "phase C skipped: /tmp/graft_ev100 not staged (tools/scale_up.py regenerates it)"
fi
log "GATE-DONE"
