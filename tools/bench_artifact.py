#!/usr/bin/env python3
"""Inspect and maintain BENCH_FULL-style artifacts (r17 verdict/ADVICE).

Subcommands:

  state ART
      Print the artifact's host window: quiet | ambient | drifted.
      Reads the tri-state `host_state` stamp; pre-r18 artifacts carry
      only the boolean, which maps false->quiet, true->drifted (the
      boolean's exact old meaning). Missing both -> drifted: an
      unlabeled window must never read better than drifted.

  median-total ART
      Median across the artifact's pass totals — the REPRESENTATIVE
      statistic gate keep-best selects officials by (r17 ADVICE: the
      old min-across-passes keep-best made the official headline the
      luckiest pass of the luckiest capture of an overnight sweep — a
      floor-style order statistic presented as the official; min
      selection is reserved for the floor).

  min-total ART
      Min across pass totals (floor-style; kept for floor diagnostics).

  restamp-floor --floor FLOOR ART [ART...]
      Re-emit each artifact's embedded "floor" block against FLOOR
      (normally the just-merged BENCH_NOISE.json). The gate min-merges
      every capture into the floor right after the artifact is
      written, which leaves the artifact's self-computed block stale
      (r17 ADVICE: the committed official said 0.979 while the
      committed floor gave 1.024). Only the trailing "floor" block is
      spliced — every other byte of the measurement is preserved — and
      the block carries the floor file's sha256 plus "restamped":true
      so the mutation is self-documenting. Ratio arithmetic and
      formatting mirror BenchFloor.block exactly (per-query min across
      the artifact's passes vs the floor's min; intersection
      denominator; single-pass caveat).

  label ART KEY VALUE
      Insert or replace a top-level string field (e.g. the gate's
      selection note: label BENCH_FULL.json gate_selection
      "best-of-3-sweep by state rank then median pass total"). Spliced
      before the floor block; never touches measurements.
"""
import argparse
import hashlib
import json
import re
import statistics
import sys

# Must match BenchFloor.SinglePassCaveat byte-for-byte so restamped and
# Bench-emitted blocks are indistinguishable in form.
SINGLE_PASS_CAVEAT = (
    "single pass: ratios are pass-1 vs the floor's steady-state min; "
    "warm-state queries (memoized BPE table, cache-warm scans) "
    "false-flag -- compare REPEAT>=2 captures for movers")


def load(path):
    with open(path) as f:
        return json.load(f)


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


def host_state(d):
    s = d.get("host_state")
    if s in ("quiet", "ambient", "drifted"):
        return s
    drifted = d.get("drifted")
    if drifted is False:
        return "quiet"
    return "drifted"


def floor_block_text(floor_path, floor_sha, art, floor_queries):
    """The exact text BenchFloor.block emits, plus restamped:true."""
    mins = per_query_min(art)
    ratios = [(q, mins[q] / floor_queries[q]) for q in sorted(mins)
              if floor_queries.get(q, 0) > 0]
    inter = sum(floor_queries[q] for q, _ in ratios)
    if not ratios or inter <= 0:
        return None
    total = sum(mins.values())
    passes = 1 + sum(1 for k in art if re.fullmatch(r"total_pass\d+", k))
    caveat = (f'"caveat":"{SINGLE_PASS_CAVEAT}",\n' if passes <= 1 else "")
    body = ",\n".join(f'  "{q}": {r:.2f}' for q, r in ratios)
    return (f',\n"floor":{{"path":"{floor_path}","sha256":"{floor_sha}",'
            f'"passes":{passes},"restamped":true,\n'
            f'{caveat}"total_ratio":{total / inter:.3f},\n'
            f'"ratios":{{\n{body}\n}}}}')


def split_floor_block(text):
    """(prefix-without-outer-brace, had_block). Floor block is last."""
    body = text.rstrip()
    assert body.endswith("}"), "artifact must be a JSON object"
    idx = body.rfind('"floor":{')
    if idx >= 0:
        prefix = body[:idx].rstrip()
        assert prefix.endswith(","), "floor block must follow a comma"
        return prefix[:-1].rstrip(), True
    return body[:-1].rstrip(), False


def cmd_restamp(args):
    with open(args.floor, "rb") as f:
        floor_bytes = f.read()
    floor_sha = hashlib.sha256(floor_bytes).hexdigest()[:12]
    floor_queries = per_query_min(json.loads(floor_bytes))
    for path in args.artifacts:
        text = open(path).read()
        art = json.load(open(path))
        block = floor_block_text(args.floor, floor_sha, art, floor_queries)
        prefix, had = split_floor_block(text)
        if block is None:
            print(f"{path}: no shared queries with {args.floor} — "
                  f"{'block removed' if had else 'no block'}")
            block = ""
        with open(path, "w") as f:
            f.write(prefix + block + "}\n")
        json.load(open(path))  # refuse to leave a corrupt artifact behind
        print(f"{path}: floor block restamped against {args.floor} "
              f"(sha {floor_sha})")


def cmd_label(args):
    text = open(args.artifact).read()
    body = text.rstrip()
    body = re.sub(r'"%s":"[^"]*",\n' % re.escape(args.key), "", body)
    entry = f'"{args.key}":"{args.value}"'
    idx = body.rfind('"floor":{')
    if idx >= 0:
        body = body[:idx] + entry + ",\n" + body[idx:]
    else:
        assert body.endswith("}")
        body = body[:-1].rstrip() + ",\n" + entry + "}"
    with open(args.artifact, "w") as f:
        f.write(body + "\n")
    json.load(open(args.artifact))
    print(f"{args.artifact}: {args.key} = {args.value}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("state")
    p.add_argument("artifact")
    p = sub.add_parser("median-total")
    p.add_argument("artifact")
    p = sub.add_parser("min-total")
    p.add_argument("artifact")
    p = sub.add_parser("restamp-floor")
    p.add_argument("--floor", required=True)
    p.add_argument("artifacts", nargs="+")
    p = sub.add_parser("label")
    p.add_argument("artifact")
    p.add_argument("key")
    p.add_argument("value")
    args = ap.parse_args()

    if args.cmd == "state":
        print(host_state(load(args.artifact)))
    elif args.cmd == "median-total":
        print(statistics.median(pass_totals(load(args.artifact))))
    elif args.cmd == "min-total":
        print(min(pass_totals(load(args.artifact))))
    elif args.cmd == "restamp-floor":
        cmd_restamp(args)
    elif args.cmd == "label":
        cmd_label(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
