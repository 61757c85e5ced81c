#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the engine): mirrors the driver's
DuckDB-oracle correctness gate so parity bugs surface before the round
ends. Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOutDir>
where <verifyOutDir> was produced by `sbt "runMain graft.Verify <sfDir> <out>"`.
Compares each <out>/<name>/ parquet against the SQL in oracle_sql.json,
with columns sorted by name and rows sorted by all columns (the
strictest plausible interpretation of the driver's hash compare)."""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(want)} rows)" + (f"  [{msg}]" if msg else ""))
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


def compare(got, want):
    import pandas as pd
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        return False, f"columns {list(g.columns)} != {list(w.columns)}"
    if len(g) != len(w):
        return False, f"rowcount {len(g)} != {len(w)}"
    if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
        return False, f"dtypes {list(map(str, g.dtypes))} != {list(map(str, w.dtypes))}"
    key = list(g.columns)
    g = g.sort_values(key, kind="mergesort").reset_index(drop=True)
    w = w.sort_values(key, kind="mergesort").reset_index(drop=True)
    max_rel = 0.0
    for c in g.columns:
        gc, wc = g[c], w[c]
        if str(gc.dtype).startswith("float"):
            both_nan = gc.isna() & wc.isna()
            eq = (gc == wc) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                diff = abs(gc[bad] - wc[bad])
                denom = max(abs(wc[bad]), 1e-300) if not math.isnan(wc[bad]) else float("nan")
                return False, (f"float col {c} row {bad}: {gc[bad]!r} != {wc[bad]!r} "
                               f"(absdiff {diff:.3e}, reldiff {diff/denom:.3e})")
        else:
            eq = (gc == wc) | (gc.isna() & wc.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return False, f"col {c} row {bad}: {gc[bad]!r} != {wc[bad]!r}"
    return True, ""


if __name__ == "__main__":
    main()
