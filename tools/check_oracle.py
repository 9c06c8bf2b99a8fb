#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the same parquet tables, compare with the Verify parquet
dump (columns sorted by name, row/schema/value compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell(v):
    import numpy as np
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, float):
        return repr(round(v, 9))
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        got = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        got_c, exp_c = canon(got), canon(exp)
        ok = True
        if list(got_c.columns) != list(exp_c.columns):
            print(f"  [FAIL-cols] {name}: spark={list(got_c.columns)} duck={list(exp_c.columns)}")
            ok = False
        elif len(got_c) != len(exp_c):
            print(f"  [FAIL-rows] {name}: spark={len(got_c)} duck={len(exp_c)}")
            ok = False
        else:
            for col in got_c.columns:
                g = [cell(v) for v in got_c[col]]
                e = [cell(v) for v in exp_c[col]]
                if g != e:
                    bad = next(i for i in range(len(g)) if g[i] != e[i])
                    print(f"  [FAIL-val ] {name}.{col} row {bad}: spark={g[bad]} duck={e[bad]}")
                    ok = False
                    break
        if ok:
            print(f"  [PASS     ] {name}: {len(got_c)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
