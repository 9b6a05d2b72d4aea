#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare (rows, schema-by-sorted-column-name,
values) against the Spark parquet dumps from graft.Verify."""
import json, sys, glob, math
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
        def eq(a, b):
            if a is None or b is None:
                return a is None and b is None
            # floats: tolerance — Spark and DuckDB double paths differ in ulps
            if isinstance(a, float) or isinstance(b, float):
                try:
                    fa, fb = float(a), float(b)
                except (TypeError, ValueError):
                    return a == b
                if fa != fa and fb != fb:  # both NaN
                    return True
                return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
            return a == b or (a != a and b != b)
        for c in scols:
            sv, ov = s[c].tolist(), o[c].tolist()
            diff = [i for i, (a, b) in enumerate(zip(sv, ov)) if not eq(a, b)]
            if diff:
                i = diff[0]
                print(f"{name}: VALUE col={c} row={i} spark={sv[i]!r} oracle={ov[i]!r} ({len(diff)} diffs)")
                ok = False
                break
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    if not ok:
        fails += 1
print(f"\n{len(oracles)} oracle queries, {fails} failing")
