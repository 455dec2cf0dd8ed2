#!/usr/bin/env python3
"""Combined-stage growth table: per query, combo100 time vs
max(text100, ev100) at the SAME pass — the single-lane ceiling it
should track, since the combined stage holds each lane at the same
scale as its dedicated stage. Passes are compared like-for-like
(p1 vs p1, p2 vs p2): pass 1 carries one-time staging costs (bucketed
copies, z-order layout, landing zones) on every stage, so comparing
combo p1 against a warm single-lane pass misreads staging as blowup.
Ratios > 2x with > 2s absolute are flagged; those are interference,
not data growth.

Usage: growth_table.py [queries|queries_pass2]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    combo_pass = sys.argv[1] if len(sys.argv) > 1 else "queries"
    combo = load("BENCH_FULL_graft_combo100.json")
    text = load("BENCH_FULL_graft_text100.json")
    ev = load("BENCH_FULL_graft_ev100.json")
    cq = combo[combo_pass]

    def same_pass(d, k):
        return d.get(combo_pass, {}).get(k)

    rows = []
    for k, cv in cq.items():
        tv, evv = same_pass(text, k), same_pass(ev, k)
        ceil_vals = [v for v in (tv, evv) if v is not None]
        if not ceil_vals:
            continue
        ceil = max(ceil_vals)
        rows.append((k, cv, tv, evv, ceil, cv / max(ceil, 0.05)))
    rows.sort(key=lambda r: -r[5])
    blowups = [r for r in rows if r[5] > 2.0 and r[1] > 2.0]
    print(f"combo pass: {combo_pass}; {len(cq)} queries; "
          f"{len(blowups)} with combo > 2x same-pass single-lane ceiling and > 2s")
    print(f"{'query':32s} {'combo':>7s} {'text100':>8s} {'ev100':>7s} "
          f"{'ceiling':>8s} {'ratio':>6s}")
    for k, cv, tv, evv, ceil, r in rows[:20]:
        flag = " <== BLOWUP" if r > 2.0 and cv > 2.0 else ""
        print(f"{k:32s} {cv:7.1f} {tv if tv is not None else -1:8.1f} "
              f"{evv if evv is not None else -1:7.1f} {ceil:8.1f} {r:6.2f}{flag}")


if __name__ == "__main__":
    main()
