#!/usr/bin/env python3
"""Adjudicate the r14 OSR-cliff mitigation campaign.

Reads the per-session BENCH_FULL artifacts snapshotted by
tools/cliff_campaign.sh into /tmp/campaign_r14/sNN_{cut,ctl}.json and
prints, per session: both q_event_resample passes, both pass totals,
and any query whose worst pass exceeds 3x its own cross-campaign min
(>=5s floor) -- the same definition the BenchTrace SLO uses, applied
over the whole campaign so no single contaminated artifact can hide a
cliff. Exit is informational only; the adjudication lives in SCALE.md.
"""
import glob
import json
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign_r14"
FLOOR = 5.0

sessions = {}
for path in sorted(glob.glob(os.path.join(OUT, "s??_*.json"))):
    tag = os.path.basename(path)[:-5]
    d = json.load(open(path))
    sessions[tag] = {
        "pass1": d["queries"],
        "pass2": d.get("queries_pass2", {}),
        "totals": (d["value"], d.get("total_pass2")),
    }

if not sessions:
    print("no session artifacts found in", OUT)
    sys.exit(1)

# cross-campaign per-query min (the demonstrated-achievable time)
floor = {}
for s in sessions.values():
    for p in ("pass1", "pass2"):
        for q, v in s[p].items():
            floor[q] = min(floor.get(q, 1e18), v)

print(f"{'session':12s} {'resample p1':>11s} {'resample p2':>11s} "
      f"{'total p1':>9s} {'total p2':>9s}  cliffs(>=3x campaign-min, >={FLOOR}s)")
# arm comes from the tag suffix (sNN_<arm>): cut/ctl for the r14 A/B
# campaign, a single arm (e.g. bnd) for the r15 bounded-shape re-run
import collections
arm_stats = collections.defaultdict(list)
for tag in sorted(sessions):
    s = sessions[tag]
    r1 = s["pass1"].get("q_event_resample", float("nan"))
    r2 = s["pass2"].get("q_event_resample", float("nan"))
    cliffs = []
    for p in ("pass1", "pass2"):
        for q, v in s[p].items():
            if v >= FLOOR and v > 3 * floor[q]:
                cliffs.append(f"{q}@{p[-1]}={v:.1f}(min {floor[q]:.1f})")
    arm = tag.split("_")[1]
    arm_stats[arm].append((r1, r2, cliffs))
    print(f"{tag:12s} {r1:11.1f} {r2:11.1f} "
          f"{s['totals'][0]:9.1f} {s['totals'][1]:9.1f}  {'; '.join(cliffs)}")

print()
for arm, rows in arm_stats.items():
    if not rows:
        continue
    passes = [v for r1, r2, _ in rows for v in (r1, r2)]
    n_cliff_sessions = sum(1 for _, _, c in rows
                           if any(x.startswith("q_event_resample") for x in c))
    n_cliff_passes = sum(1 for r1, r2, _ in rows for v in (r1, r2)
                         if v > 3 * floor.get("q_event_resample", 1e18))
    print(f"{arm}: {len(rows)} sessions / {len(passes)} resample passes; "
          f"resample cliff sessions={n_cliff_sessions}, "
          f"cliff passes={n_cliff_passes}; "
          f"resample min/max = {min(passes):.1f}/{max(passes):.1f}s")
