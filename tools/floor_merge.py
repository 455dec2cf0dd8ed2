#!/usr/bin/env python3
"""Min-merge bench captures into the same-tree noise floor.

The floor's contract (BenchFloor.scala: "min across the floor
artifact's passes, the best the tree has done") was implemented until
round 17 as a SINGLE capture chosen for quietness. Round-17
continuation evidence broke that identification: an ambient-window
capture ran pass-3 at 89.2 s — 0.84x the standing 105.7 s "floor"
captured in the pre-probe era. A floor that a drifted run can beat is
not a floor.

This tool makes the floor the thing its contract says it is: the
element-wise per-query MINIMUM over every valid same-tree capture.
Merging minima from drifted captures is sound in the only direction
that matters — host churn inflates wall-clock, it never deflates it,
so a fast reading is genuinely-achieved tree performance whatever the
capture's overall stamp. The merge can only LOWER floor entries,
which makes later official-vs-floor ratios stricter, never flatter.

Same-tree guard (r17 verdict #1 + ADVICE — the r17 version DEFAULTED a
missing head to the current checkout's, which inverted the guard for
exactly the artifacts most likely to be cross-tree and fabricated
provenance in merged_from):

  * The PREFERRED identity is `timed_path_sha` (Bench stamps a content
    hash of src/main + build.sbt — the code that actually runs). Equal
    shas = byte-identical timed code, whatever the commit heads say;
    docs-only commits no longer force cross-tree adjudication, and a
    dirty work tree can't hide behind its parent commit's head.
  * Captures lacking `timed_path_sha` fall back to `git_head`, and a
    missing or `-dirty` head is a REFUSAL, not a default: provenance
    is never fabricated. `--allow-cross-tree` overrides after human
    adjudication (set it only when every timed-path edit between the
    identities is known neutral — record why in SCALE.md), and
    merged_from then records the capture's true recorded identity, or
    the literal "unknown" — NEVER the merge-time head.
  * On an --allow-cross-tree merge the floor ADOPTS the last capture's
    identity (the floor now corresponds to the newest adjudicated
    tree), so subsequent same-tree merges need no flag.

Usage:
  python3 tools/floor_merge.py BENCH_NOISE.json capture.json [...] \
      [--out BENCH_NOISE.json] [--allow-cross-tree]

Writes the merged floor (default: in place) with:
  queries      per-query min over the floor and all captures
  value        sum of per-query mins (the composite floor total --
               the same quantity BenchFloor's total_ratio denominator
               sums, so artifact blocks and this headline agree)
  merged_from  provenance: path, recorded identity (git head +
               timed_path_sha, "unknown" when absent), host_state/
               drifted stamp, probe fields and per-source pass totals
               of every merged capture

After a merge, any capture's embedded "floor" block is stale (it was
computed against the pre-merge floor — its `sha256` field proves it);
re-emit with `python3 tools/bench_artifact.py restamp-floor`.
"""
import argparse
import json
import sys


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


def identity(d):
    """(timed_path_sha|None, git_head|None) as RECORDED -- no defaults."""
    sha = d.get("timed_path_sha")
    head = d.get("git_head")
    return (sha if sha and sha != "unknown" else None,
            head if head and head != "unknown" else None)


def same_tree(cap, floor):
    """None if same tree, else a human-readable mismatch reason."""
    cap_sha, cap_head = identity(cap)
    fl_sha, fl_head = identity(floor)
    if cap_sha and fl_sha:
        return (None if cap_sha == fl_sha else
                f"timed_path_sha {cap_sha} != floor's {fl_sha}")
    if cap_sha is None and cap_head is None:
        return "capture records no git_head/timed_path_sha (pre-stamp era?)"
    if fl_sha is None and fl_head is None:
        return "floor records no git_head/timed_path_sha"
    if cap_head and cap_head.endswith("-dirty"):
        return (f"capture head {cap_head} is dirty (uncommitted timed-path "
                "edits -- its code is not any commit's)")
    if fl_head and fl_head.endswith("-dirty"):
        return f"floor head {fl_head} is dirty"
    if cap_head and fl_head:
        return (None if cap_head == fl_head else
                f"git head {cap_head} != floor's {fl_head}")
    return "identity fields don't overlap (one side sha-only, other head-only)"


def provenance_entry(path, d, lowered=None):
    sha, head = identity(d)
    e = {"path": path, "git_head": head or "unknown",
         "timed_path_sha": sha or "unknown",
         "host_state": d.get("host_state"), "drifted": d.get("drifted"),
         "probe": d.get("probe"), "pass_totals": pass_totals(d)}
    if lowered is not None:
        e["entries_lowered"] = lowered
    return e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("floor")
    ap.add_argument("captures", nargs="+")
    ap.add_argument("--out", default=None)
    ap.add_argument("--allow-cross-tree", action="store_true")
    args = ap.parse_args()

    floor = json.load(open(args.floor))
    merged = per_query_min(floor)
    provenance = floor.get("merged_from") or [provenance_entry(args.floor, floor)]
    floor_identity = floor  # identity fields read off the floor dict

    lowered_total = 0
    last_cap = None
    for path in args.captures:
        cap = json.load(open(path))
        if cap.get("failed"):
            sys.exit(f"refusing {path}: failed queries {cap['failed']}")
        mismatch = same_tree(cap, floor_identity)
        if mismatch and not args.allow_cross_tree:
            sys.exit(f"refusing {path}: {mismatch} "
                     "(--allow-cross-tree to override after adjudication)")
        if mismatch:
            print(f"cross-tree merge ALLOWED for {path}: {mismatch}")
        lowered = 0
        for q, v in per_query_min(cap).items():
            if q not in merged or v < merged[q]:
                merged[q] = v
                lowered += 1
        provenance.append(provenance_entry(path, cap, lowered))
        lowered_total += lowered
        last_cap = cap
        print(f"merged {path}: {lowered} of {len(merged)} entries lowered")

    # identity of the merged floor: unchanged on a same-tree merge; on an
    # --allow-cross-tree merge adopt the last capture's recorded identity
    # (the adjudication says the floor now describes that tree)
    out_sha, out_head = identity(floor_identity)
    if args.allow_cross_tree and last_cap is not None:
        cap_sha, cap_head = identity(last_cap)
        if cap_sha or cap_head:
            out_sha, out_head = cap_sha, cap_head

    out = {
        "metric": "floor",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "sf": floor.get("sf"),
        "git_head": out_head or "unknown",
        "timed_path_sha": out_sha or "unknown",
        "note": "per-query min over all merged_from captures; "
                "value = sum of per-query mins (BenchFloor total_ratio "
                "denominator). Reset this file when the timed path changes.",
        "merged_from": provenance,
        "queries": dict(sorted(merged.items())),
    }
    if floor.get("head_note"):
        out["head_note"] = floor["head_note"]
    dest = args.out or args.floor
    with open(dest, "w") as f:
        json.dump(out, f, indent=0)
        f.write("\n")
    print(f"floor -> {dest}: {len(merged)} queries, "
          f"composite total {out['value']} s, {lowered_total} entries lowered")


if __name__ == "__main__":
    main()
