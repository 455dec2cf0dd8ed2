#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
against the sf parquet tables, compare with the Verify parquet dumps.
Compare = sort columns by name, sort rows, exact value equality.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a machine-readable per-query result file
({query: {"status": pass|fail|skip, "rows": N}, "__summary__": ...}) so
scaled-stage gate claims (e.g. the 10x replica) are verifiable from a
committed artifact, not prose.
"""
import sys, glob, os, json
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints to int64 where possible, timestamps to ns
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # arrays/lists aren't sortable/hashable: canonicalize to string
            df[c] = df[c].apply(
                lambda v: str(list(v)) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir, json_out=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  SKIP {name}: no oracle ({len(got)} rows)")
            results[name] = {"status": "skip", "rows": len(got)}
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ FAIL {name}: oracle SQL error: {e}")
            results[name] = {"status": "fail", "rows": len(got),
                             "reason": f"oracle SQL error: {e}"}
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        # Driver-hash fidelity: a DuckDB HUGEINT (e.g. un-cast SUM of ints)
        # lands in pandas as float64 while Spark emits int64 — values compare
        # equal here but the driver's stringified hash sees 42.0 vs 42.
        def _drift(a, b):
            ka, kb = a.dtype.kind, b.dtype.kind
            return ka != kb and "f" in (ka, kb) and ka in "fiu" and kb in "fiu"
        kind_drift = [c for c in exp.columns
                      if c in got.columns and _drift(got[c], exp[c])]
        if kind_drift:
            print(f"✗ FAIL {name}: int-vs-float dtype drift on {kind_drift} "
                  f"(spark={[str(got[c].dtype) for c in kind_drift]} "
                  f"duckdb={[str(exp[c].dtype) for c in kind_drift]}) — align the CASTs")
            results[name] = {"status": "fail", "rows": len(got),
                             "reason": f"dtype drift on {kind_drift}"}
            n_fail += 1
            continue
        if list(g.columns) != list(e.columns):
            print(f"✗ FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            results[name] = {"status": "fail", "rows": len(got),
                             "reason": "column mismatch"}
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"✗ FAIL {name}: rows {len(g)} vs {len(e)}")
            results[name] = {"status": "fail", "rows": len(got),
                             "reason": f"rows {len(g)} vs {len(e)}"}
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"  PASS {name} ({len(g)} rows)")
            results[name] = {"status": "pass", "rows": len(g)}
            n_pass += 1
        except AssertionError as ex:
            print(f"✗ FAIL {name}: {str(ex).splitlines()[0]}")
            # show first few diffs
            for c in g.columns:
                neq = ~((g[c] == e[c]) | (g[c].isna() & e[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"    col {c}: row {i}: got={g[c][i]!r} exp={e[c][i]!r} ({int(neq.sum())} diffs)")
            results[name] = {"status": "fail", "rows": len(got),
                             "reason": "value mismatch"}
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        results["__summary__"] = {"sf_dir": sf_dir, "out_dir": out_dir,
                                  "pass": n_pass, "fail": n_fail,
                                  "skip": sum(1 for v in results.values()
                                              if isinstance(v, dict) and
                                              v.get("status") == "skip")}
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
