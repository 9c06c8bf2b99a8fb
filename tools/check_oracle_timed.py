#!/usr/bin/env python3
"""check_oracle with per-query wall-clock timing and a hard timeout:
each oracle runs in its own subprocess (DuckDB has no in-process query
timeout), so one pathological oracle at stress scale cannot eat the
whole gate. Timing output doubles as the oracle-cost record for
STRESS_r{N}.md.

The compare itself (TABLES / canon / cell) is imported from
check_oracle.py so the two gates can never drift in equality semantics.
Exit code mirrors check_oracle.py: non-zero iff any FAIL or TIMEOUT.

Usage: tools/check_oracle_timed.py <sfDir> <verifyOutDir> [timeoutSec] [skip,names]
"""
import sys, os, json, glob, time, tempfile, subprocess

TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))

WORKER = r'''
import sys, json
import pandas as pd
import duckdb
tools_dir, sf_dir, sql_json, got_dir = sys.argv[1:5]
sys.path.insert(0, tools_dir)
from check_oracle import TABLES, canon, cell

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
import os
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
with open(sql_json) as f:
    sql = json.load(f)["sql"]
exp = con.execute(sql).fetchdf()
got = pd.read_parquet(got_dir)

got_c, exp_c = canon(got), canon(exp)
if list(got_c.columns) != list(exp_c.columns):
    print(f"FAIL-cols spark={list(got_c.columns)} duck={list(exp_c.columns)}")
elif len(got_c) != len(exp_c):
    print(f"FAIL-rows spark={len(got_c)} duck={len(exp_c)}")
else:
    import hashlib
    def h(df):
        m = hashlib.sha256()
        for row in df.itertuples(index=False):
            m.update("|".join(cell(v) for v in row).encode())
        return m.hexdigest()
    print("PASS" if h(got_c) == h(exp_c) else "FAIL-hash", len(got_c), "rows")
'''


def main(sf_dir, out_dir, timeout=900, skip=frozenset()):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    with tempfile.TemporaryDirectory(prefix="oracle_gate_") as tmp:
        for qdir in sorted(glob.glob(f"{out_dir}/*/")):
            name = os.path.basename(qdir.rstrip("/"))
            if name in skip:
                print(f"  [SKIP     ] {name}")
                results[name] = ("skip", 0.0)
                continue
            if name not in oracles:
                print(f"  [rows-only] {name}")
                results[name] = ("rows-only", 0.0)
                continue
            sql_file = os.path.join(tmp, f"oracle_q_{name}.json")
            with open(sql_file, "w") as f:
                json.dump({"sql": oracles[name]}, f)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", WORKER,
                     TOOLS_DIR, sf_dir, sql_file, qdir],
                    capture_output=True, text=True, timeout=timeout)
                dt = time.time() - t0
                out = (r.stdout or r.stderr).strip().splitlines()
                line = out[-1] if out else "no-output"
                tag = "PASS" if line.startswith("PASS") else "FAIL"
                print(f"  [{tag:9s}] {name}: {line}  ({dt:.1f}s)")
                results[name] = (tag, dt)
            except subprocess.TimeoutExpired:
                dt = time.time() - t0
                print(f"  [TIMEOUT  ] {name}: oracle exceeded {timeout}s")
                results[name] = ("timeout", dt)
    n = {}
    for tag, _ in results.values():
        n[tag] = n.get(tag, 0) + 1
    print("==", ", ".join(f"{v} {k}" for k, v in sorted(n.items())), "==")
    return 1 if n.get("FAIL", 0) or n.get("timeout", 0) else 0


if __name__ == "__main__":
    skip = frozenset(sys.argv[4].split(",")) if len(sys.argv) > 4 else frozenset()
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 900, skip))
