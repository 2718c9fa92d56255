#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same sf dir and compare
(row count, sorted-by-name columns, canonicalized values).

Usage: python3 tools/local_verify.py [sfdir] [--skip-spark]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-spark" not in sys.argv:
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
                       cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    tail = [l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()]
    for l in tail[:30]:
        print(l)

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

# _SF sentinel (written by graft.Verify): refuse to compare dumps produced
# from a different sf dir than the one requested — the stale-dump trap
# (widespread bogus value mismatches with matching row counts) was hit
# twice in round 11.
sf_sentinel = Path(f"{OUT}/_SF")
if sf_sentinel.exists():
    dumped_sf = sf_sentinel.read_text().strip()
    if Path(dumped_sf).resolve() != Path(SF).resolve():
        print(f"REFUSE: {OUT} holds dumps from {dumped_sf}, not {SF} — rerun without --skip-spark")
        sys.exit(1)

# Mirror Verify's SPARK_GRAFT_ONLY filter (exact or `_`-prefix token match,
# same rule as graft.NameFilter — bare startswith made ONLY=q14 select
# q140–q149 too): without this, an ONLY run compares every OTHER query
# against whatever dumps happen to be lying in OUT.
import os
only = os.environ.get("SPARK_GRAFT_ONLY")
if only:
    tokens = only.split(",")
    oracle = {k: v for k, v in oracle.items()
              if any(k == t or k.startswith(t + "_") for t in tokens)}

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bool): return str(int(v))
    return str(v)

def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)

fails = []
for name, sql in sorted(oracle.items()):
    pq = f"{OUT}/{name}"
    if not list(Path(pq).glob("*.parquet")):
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    s = con.execute(f"select * from read_parquet('{pq}/*.parquet')")
    scols = [d[0] for d in s.description]; srows = s.fetchall()
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]; orows = o.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails.append(name); continue
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}"); fails.append(name); continue
    # Mirror the driver's type-sensitive value hash: compare Arrow types per
    # column (DuckDB widens sum(int) to HUGEINT=decimal128 while Spark parquet
    # reads back int64 — caught here, invisible to str() canon below).
    sarrow = con.execute(f"select * from read_parquet('{pq}/*.parquet')").arrow().schema
    oarrow = con.execute(sql).arrow().schema
    stypes = {f.name: str(f.type) for f in sarrow}
    otypes = {f.name: str(f.type) for f in oarrow}
    tdiff = {c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes.get(c, stypes[c])}
    if tdiff:
        print(f"FAIL {name}: arrow type drift {tdiff}"); fails.append(name); continue
    cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
    if cs != co:
        diff = next((i for i, (a, b) in enumerate(zip(cs, co)) if a != b), min(len(cs), len(co)))
        print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}; first diff @ {diff}:")
        print("  spark :", cs[diff] if diff < len(cs) else "<missing>")
        print("  oracle:", co[diff] if diff < len(co) else "<missing>")
        fails.append(name); continue
    print(f"OK   {name}: {len(cs)} rows")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
