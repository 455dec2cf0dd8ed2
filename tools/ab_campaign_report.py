#!/usr/bin/env python3
"""Adjudicate the shared-map-lever A/B campaign (tools/ab_campaign_combo_r15.sh).

Reads the per-session artifacts from the campaign OUT dir (s*_ctl.json /
s*_trt.json), plus optionally the preliminary 1-vs-1 pair, and prints:
  - per-arm resample pass values and cliff counts (cliff = pass > THRESH,
    default 30 s -- the clean range across both arms is 5-12 s and every
    observed cliff instance is >=48 s, so any threshold in 15-45 s reads
    the same verdict);
  - per-arm steady-state totals EXCLUDING resample (the lever's global
    cost, isolated from the very effect it removes);
  - the worst per-query pass-2 treatment/control ratio table (movers
    >=1.3x with >=0.3 s absolute), to catch any query the shared-map
    path genuinely hurts.
Usage: ab_campaign_report.py [OUTDIR] [--thresh SECS] [--prelim ctl.json trt.json]
"""
import json, sys, glob, statistics as st

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    args = sys.argv[1:]
    outdir = args[0] if args and not args[0].startswith("--") else "/tmp/ab_combo_r15"
    thresh = 30.0
    prelim = []
    if "--thresh" in args:
        thresh = float(args[args.index("--thresh") + 1])
    if "--prelim" in args:
        i = args.index("--prelim")
        prelim = [("prelim_ctl", load(args[i + 1])), ("prelim_trt", load(args[i + 2]))]
    sessions = prelim + [
        (p.split("/")[-1].removesuffix(".json"), load(p))
        for p in sorted(glob.glob(f"{outdir}/s*_[ct]*.json"))
    ]
    if not sessions:
        sys.exit(f"no session artifacts under {outdir}")
    arms = {"ctl": [], "trt": []}
    for tag, a in sessions:
        arm = "ctl" if "ctl" in tag else "trt"
        r1 = a["queries"]["q_event_resample"]
        r2 = a["queries_pass2"]["q_event_resample"]
        ex1 = a["value"] - r1
        ex2 = a["total_pass2"] - r2
        arms[arm].append((tag, r1, r2, ex1, ex2, a))
        cliff = "".join(" CLIFF" for v in (r1, r2) if v > thresh)
        print(f"{tag:12s} resample {r1:6.1f}/{r2:6.1f}  totals-excl-resample "
              f"{ex1:6.1f}/{ex2:6.1f}  full {a['value']:6.1f}/{a['total_pass2']:6.1f}{cliff}")
    print()
    for arm, rows in arms.items():
        if not rows:
            continue
        passes = [v for _, r1, r2, *_ in rows for v in (r1, r2)]
        cliffs = sum(v > thresh for v in passes)
        ex2s = [ex2 for *_, ex2, _ in rows]
        print(f"{arm}: {len(rows)} sessions, resample cliffs {cliffs}/{len(passes)} passes "
              f"(thresh {thresh}s), resample passes {sorted(round(v,1) for v in passes)}, "
              f"median p2-total-excl-resample {st.median(ex2s):.1f}s")
    if arms["ctl"] and arms["trt"]:
        # Fisher exact on SESSIONS (a session "cliffed" if any pass did) --
        # passes within a session share a JIT state, so sessions are the
        # honest independence unit; pass counts above are descriptive.
        def cliffed(rows):
            return sum(1 for _, r1, r2, *_ in rows if r1 > thresh or r2 > thresh)
        from math import comb
        a, b = cliffed(arms["ctl"]), cliffed(arms["trt"])
        n1, n2 = len(arms["ctl"]), len(arms["trt"])
        k = a + b
        # one-sided: P(ctl cliffs >= a | margins fixed)
        p = sum(comb(n1, x) * comb(n2, k - x) for x in range(a, min(k, n1) + 1)
                if 0 <= k - x <= n2) / comb(n1 + n2, k)
        print(f"\nsession-level cliff table: ctl {a}/{n1}, trt {b}/{n2}; "
              f"Fisher exact one-sided p = {p:.4f}")
        mc = st.median([ex2 for *_, ex2, _ in arms["ctl"]])
        mt = st.median([ex2 for *_, ex2, _ in arms["trt"]])
        print(f"\nsteady-state lever cost (median p2 excl resample): "
              f"{mt:.1f}s vs {mc:.1f}s = {100*(mt-mc)/mc:+.1f}%")
        # per-query p2 movers: median across sessions per arm, treatment/control
        qs = set(arms["ctl"][0][5]["queries_pass2"]) & set(arms["trt"][0][5]["queries_pass2"])
        movers = []
        for q in qs:
            if q == "q_event_resample":
                continue
            c = st.median([a["queries_pass2"][q] for *_, a in arms["ctl"]])
            t = st.median([a["queries_pass2"][q] for *_, a in arms["trt"]])
            if t >= 1.3 * c and t - c >= 0.3:
                movers.append((t / c, q, c, t))
        print("treatment p2 regressions >=1.3x (median-vs-median):" if movers
              else "no treatment p2 regression >=1.3x with >=0.3s absolute (median-vs-median)")
        for r, q, c, t in sorted(movers, reverse=True):
            print(f"  {q:28s} {c:6.2f} -> {t:6.2f}  ({r:.2f}x)")

if __name__ == "__main__":
    main()
