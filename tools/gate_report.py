#!/usr/bin/env python3
"""Render the r17 probe-gated capture artifacts as the SCALE.md tables.

Usage:
  python3 tools/gate_report.py [--floor BENCH_NOISE.json]
                               [--official BENCH_FULL.json]
                               [--ev100 BENCH_FULL_graft_ev100.json]

Prints, for whichever artifacts exist:
  - probe/drifted summary per artifact
  - official vs floor: total ratio, per-query ratio distribution,
    top movers (the artifact's own "floor" block if present, else
    computed here the same way)
  - ev100 stream-lane p1/p2 table in SCALE.md markdown, ready to paste
    as the recipe corroboration column
"""
import argparse
import json
import os
import re
import statistics
import sys

STREAM_LANES = [
    "q_stream_tumbling", "q_stream_sliding", "q_stream_sessions",
    "q_stream_sessions_v2", "q_stream_session_window", "q_stream_join",
    "q_stream_left_join", "q_stream_full_join", "q_stream_dedup",
    "q_stream_upsert", "q_stream_static_join", "q_stream_first_touch",
    "q_stream_first_touch_boot",
]


def load(path):
    with open(path) as f:
        return json.load(f)


def probe_line(d):
    p = d.get("probe", {})
    state = d.get("host_state") or (
        "quiet" if d.get("drifted") is False else "drifted(bool)")
    return (f"host_state={state} "
            f"fsync {p.get('pre_fsync_ms', '?')}->{p.get('post_fsync_ms', '?')} ms, "
            f"spin {p.get('pre_spin_s', '?')}->{p.get('post_spin_s', '?')} s")


def pass_totals(d):
    totals = [d.get("value")]
    for k in sorted(d):
        m = re.fullmatch(r"total_pass(\d+)", k)
        if m:
            totals.append(d[k])
    return [t for t in totals if t is not None]


def floor_min(d):
    """Per-query min across the artifact's pass maps (the true floor)."""
    out = {}
    for k, v in d.items():
        if k == "queries" or re.fullmatch(r"queries_pass\d+", k):
            for q, s in v.items():
                out[q] = min(out.get(q, s), s)
    return out


def report_official(official, floor):
    # both sides steady-state (per-query min across passes): pass-1
    # ratios false-flag warm-state queries (BPE apply memoizes its
    # merge table: p1 4.2 s vs p2/p3 0.4-0.6 s, same shape in the floor)
    fl = floor_min(floor)
    qs = floor_min(official)
    qs = {q: s for q, s in qs.items() if q in official.get("queries", {})}
    ratios = {q: s / fl[q] for q, s in qs.items() if fl.get(q, 0) > 0}
    if not ratios:
        print("  (no shared queries with floor)")
        return
    vals = sorted(ratios.values())
    inter_floor = sum(fl[q] for q in qs if fl.get(q, 0) > 0)
    totals = pass_totals(official)
    print(f"  pass totals: {['%.1f' % t for t in totals]} s "
          f"(median {statistics.median(totals):.1f} — the representative "
          f"official statistic) "
          f"vs floor pass-min total {sum(fl[q] for q in qs if q in fl):.1f} s")
    print(f"  total_ratio (own steady total / intersection floor): "
          f"{sum(qs.values()) / inter_floor:.3f}")
    print(f"  per-query ratio: median {statistics.median(vals):.2f}, "
          f"p10 {vals[len(vals)//10]:.2f}, p90 {vals[9*len(vals)//10]:.2f}, "
          f"max {vals[-1]:.2f}")
    movers = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    print("  top movers vs floor:")
    for q, r in movers:
        print(f"    {q:32s} {qs[q]:8.2f} s  {r:6.2f}x  (floor {fl[q]:.2f})")


def report_ev100(d):
    p1 = d.get("queries", {})
    p2 = d.get("queries_pass2", {})
    print("  SCALE.md recipe corroboration column (markdown):")
    print("  | lane | p1 (s) | p2 (s) |")
    print("  |---|---|---|")
    for lane in STREAM_LANES:
        a = p1.get(lane)
        b = p2.get(lane)
        fa = f"{a:.1f}" if a is not None else "-"
        fb = f"{b:.1f}" if b is not None else "-"
        print(f"  | {lane} | {fa} | {fb} |")
    print(f"  totals {d.get('value', 0):.1f} / "
          f"{d.get('total_pass2', 0):.1f} s; failed={d.get('failed', [])}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--floor", default="BENCH_NOISE.json")
    ap.add_argument("--official", default="BENCH_FULL.json")
    ap.add_argument("--ev100", default="BENCH_FULL_graft_ev100.json")
    args = ap.parse_args()

    floor = official = None
    for name, path in [("floor", args.floor), ("official", args.official),
                       ("ev100", args.ev100)]:
        if not os.path.isfile(path):
            print(f"== {name}: {path} (missing)")
            continue
        d = load(path)
        print(f"== {name}: {path}")
        print(f"  {probe_line(d)}")
        if name == "floor":
            floor = d
        elif name == "official":
            official = d
        elif name == "ev100":
            report_ev100(d)
    if floor and official:
        print("== official vs floor")
        report_official(official, floor)
    return 0


if __name__ == "__main__":
    sys.exit(main())
