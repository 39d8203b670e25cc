#!/usr/bin/env python3
"""Local dev-loop oracle checker (mirrors the driver's t2 gate).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name>/ parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB (tables = <sf_dir>/*.parquet
views), sorts columns by name then rows, and compares values exactly.

Driver-side tooling only — the Scala library never depends on this.
"""
import json, sys, glob, os
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output"); n_bad += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracles:
            print(f"SKIP  {name}: rows={len(got)} (no oracle, rows-only)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"ORAERR {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"BAD   {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"BAD   {name}: rows spark={len(got)} duck={len(want)}")
            n_bad += 1; continue
        # normalize dtypes: compare as strings after value-level rounding
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                    a = pd.to_datetime(a).astype("datetime64[us]")
                    b = pd.to_datetime(b).astype("datetime64[us]")
                eq = (a.astype(object).where(a.notna(), None).map(repr)
                      == b.astype(object).where(b.notna(), None).map(repr)).all() \
                    if a.dtype == object or b.dtype == object else a.equals(b.astype(a.dtype))
            except Exception as e:
                eq = False
            if not eq:
                mismatch = c
                break
        if mismatch:
            print(f"BAD   {name}: column '{mismatch}' differs")
            j = (got[mismatch].astype(str) != want[mismatch].astype(str))
            idx = j[j].index[:3] if j.any() else []
            for i in idx:
                print(f"        row {i}: spark={got[mismatch][i]!r} duck={want[mismatch][i]!r}")
            n_bad += 1
        else:
            print(f"OK    {name}: rows={len(got)}"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
