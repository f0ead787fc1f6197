#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads each parquet result dumped by `graft.Verify`, runs the matching oracle
SQL from oracle_sql.json in DuckDB over the same testdata tables, and compares
(row count, column names, values with columns sorted by name).

Dev tool only — the shipped Scala library has no python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # NOTE: deliberately NO timezone normalization — the driver's schema
    # compare does NOT strip timezones, so a tz-aware Spark dump vs the
    # oracle's naive timestamp MUST fail here exactly like it fails
    # upstream (the r13 regression: this replica tz-stripped, read 327
    # green locally, and the driver failed 7). Replica laxer than gate
    # is the one divergence this file must never have.
    # NOTE: intentionally NO canonicalization of array/struct values — the
    # real driver's pandas compare errors on them (unhashable ndarray/dict),
    # so queries must flatten complex outputs; this replica must too.
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{out}/*")):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        try:
            got = pd.read_parquet(d)
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            g, e = canon(got), canon(exp)
        except Exception as ex:
            print(f"FAIL {name}: compare error (unhashable output?): {ex}")
            n_fail += 1
            continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_datetime64_any_dtype(gv) or \
               pd.api.types.is_datetime64_any_dtype(ev):
                gtz = getattr(gv.dtype, "tz", None)
                etz = getattr(ev.dtype, "tz", None)
                if (gtz is None) != (etz is None):
                    bad = (c, f"tz-awareness {gv.dtype}/{ev.dtype} "
                           "(driver schema_match fails on this)",
                           gv.head(2).astype(str).tolist(),
                           ev.head(2).astype(str).tolist())
                    break
            if pd.api.types.is_float_dtype(gv) and pd.api.types.is_float_dtype(ev):
                eq = (gv.values == ev.values) | (pd.isna(gv.values) & pd.isna(ev.values))
                if not eq.all():
                    # report whether it's an exact miss or approx-only
                    close = np.isclose(gv.values, ev.values, rtol=1e-9, equal_nan=True)
                    bad = (c, "float-exact" if close.all() else "float",
                           gv[~eq].head(3).tolist(), ev[~eq].head(3).tolist())
                    break
            else:
                try:
                    same = gv.equals(ev) or (gv.astype(str).values == ev.astype(str).values).all()
                except Exception:
                    same = False
                if not same:
                    neq = gv.astype(str).values != ev.astype(str).values
                    bad = (c, str(gv.dtype) + "/" + str(ev.dtype),
                           gv[neq].head(3).tolist(), ev[neq].head(3).tolist())
                    break
        if bad:
            print(f"FAIL {name}: col {bad[0]} ({bad[1]}) got={bad[2]} exp={bad[3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
