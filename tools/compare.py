#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare (rows, schema-by-sorted-column-name,
values) against the Spark parquet dumps from graft.Verify."""
import json, sys, glob
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_r2"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["documents", "embeddings", "lineitem", "orders", "customer"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    except Exception:
        pass

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracles):
    sql = oracles[name]
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails += 1
        continue
    sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    ok = True
    if len(sdf) != len(odf):
        print(f"{name}: ROWS spark={len(sdf)} oracle={len(odf)}")
        ok = False
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"{name}: SCHEMA spark={scols} oracle={ocols}")
        ok = False
    if ok:
        s = sdf[scols].reset_index(drop=True)
        o = odf[ocols].reset_index(drop=True)
        for c in scols:
            sv, ov = s[c].tolist(), o[c].tolist()
            # normalize numpy types to python for equality
            svn = [None if v is None else (bool(v) if isinstance(v, bool) else v) for v in sv]
            diff = [i for i, (a, b) in enumerate(zip(sv, ov)) if not (a == b or (a != a and b != b))]
            if diff:
                i = diff[0]
                print(f"{name}: VALUE col={c} row={i} spark={sv[i]!r} oracle={ov[i]!r} ({len(diff)} diffs)")
                ok = False
                break
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    if not ok:
        fails += 1
print(f"\n{len(oracles)} oracle queries, {fails} failing")
