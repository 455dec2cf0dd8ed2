#!/usr/bin/env python3
"""Min-merge bench captures into the same-tree noise floor.

The floor's contract (BenchFloor.scala: "min across the floor
artifact's passes, the best the tree has done") was implemented until
now as a SINGLE capture chosen for quietness. Round-17 continuation
evidence broke that identification: an ambient-window capture
(fsync ~0.15 ms, stamped drifted by the boundary reading) ran pass-3
at 89.2 s — 0.84x the standing 105.7 s "floor" captured in the
pre-probe era. A floor that a drifted run can beat is not a floor.

This tool makes the floor the thing its contract says it is: the
element-wise per-query MINIMUM over every valid same-tree capture.
Merging minima from drifted captures is sound in the only direction
that matters — host churn inflates wall-clock, it never deflates it,
so a fast reading is genuinely-achieved tree performance whatever the
capture's overall stamp. The merge can only LOWER floor entries,
which makes later official-vs-floor ratios stricter, never flatter.

The floor must reset when the timed path changes: each merged source
records the git head it was captured on, and the tool refuses to merge
a capture whose recorded head differs from the floor's unless
--allow-cross-tree is given (first merge stamps the current head).

Usage:
  python3 tools/floor_merge.py BENCH_NOISE.json capture.json [...] \
      [--out BENCH_NOISE.json] [--allow-cross-tree]

Writes the merged floor (default: in place) with:
  queries      per-query min over the floor and all captures
  value        sum of per-query mins (the composite floor total --
               the same quantity BenchFloor's total_ratio denominator
               sums, so artifact blocks and this headline agree)
  merged_from  provenance: path, git head, drifted stamp, probe fields
               and per-source pass totals of every merged capture
"""
import argparse
import json
import subprocess
import sys


def git_head():
    return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()


def pass_maps(d):
    maps = [d.get("queries", {})]
    maps += [v for k, v in d.items()
             if k.startswith("queries_pass") and isinstance(v, dict)]
    return [m for m in maps if m]


def per_query_min(d):
    out = {}
    for m in pass_maps(d):
        for q, v in m.items():
            if isinstance(v, (int, float)) and (q not in out or v < out[q]):
                out[q] = v
    return out


def pass_totals(d):
    totals = [d.get("value")]
    totals += [v for k, v in sorted(d.items()) if k.startswith("total_pass")]
    return [t for t in totals if isinstance(t, (int, float))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("floor")
    ap.add_argument("captures", nargs="+")
    ap.add_argument("--out", default=None)
    ap.add_argument("--allow-cross-tree", action="store_true")
    args = ap.parse_args()

    head = git_head()
    floor = json.load(open(args.floor))
    merged = per_query_min(floor)
    floor_head = floor.get("git_head", head)
    provenance = floor.get("merged_from") or [{
        "path": args.floor, "git_head": floor_head,
        "drifted": floor.get("drifted"), "probe": floor.get("probe"),
        "pass_totals": pass_totals(floor),
    }]

    lowered_total = 0
    for path in args.captures:
        cap = json.load(open(path))
        if cap.get("failed"):
            sys.exit(f"refusing {path}: failed queries {cap['failed']}")
        cap_head = cap.get("git_head", head)
        if cap_head != floor_head and not args.allow_cross_tree:
            sys.exit(f"refusing {path}: git head {cap_head} != floor's "
                     f"{floor_head} (--allow-cross-tree to override)")
        lowered = 0
        for q, v in per_query_min(cap).items():
            if q not in merged or v < merged[q]:
                merged[q] = v
                lowered += 1
        provenance.append({
            "path": path, "git_head": cap_head,
            "drifted": cap.get("drifted"), "probe": cap.get("probe"),
            "pass_totals": pass_totals(cap), "entries_lowered": lowered,
        })
        lowered_total += lowered
        print(f"merged {path}: {lowered} of {len(merged)} entries lowered")

    out = {
        "metric": "floor",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "sf": floor.get("sf"),
        "git_head": floor_head,
        "note": "per-query min over all merged_from captures; "
                "value = sum of per-query mins (BenchFloor total_ratio "
                "denominator). Reset this file when the timed path changes.",
        "merged_from": provenance,
        "queries": dict(sorted(merged.items())),
    }
    dest = args.out or args.floor
    with open(dest, "w") as f:
        json.dump(out, f, indent=0)
        f.write("\n")
    print(f"floor -> {dest}: {len(merged)} queries, "
          f"composite total {out['value']} s, {lowered_total} entries lowered")


if __name__ == "__main__":
    main()
