#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run DuckDB oracle SQL against the
sf tables and compare (sorted columns, exact values) with the Spark parquet dumps
produced by graft.Verify. Usage: selfcheck.py <sfDir> <verifyOutDir>"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_rel = con.execute(f"SELECT * FROM parquet_scan('{d}/*.parquet')")
        s_cols = [c[0] for c in spark_rel.description]
        s_rows = spark_rel.fetchall()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(s_rows)} rows "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            if len(s_rows) == 0:
                failures.append((name, "no oracle and zero rows"))
            continue
        try:
            o_rel = con.execute(oracles[name])
            o_cols = [c[0] for c in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            failures.append((name, f"oracle error: {e}"))
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"{name:28s} SCHEMA MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            failures.append((name, "schema"))
            continue
        # align columns by sorted name
        s_idx = [s_cols.index(c) for c in sorted(s_cols)]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        s_norm = [tuple(canon(r[i]) for i in s_idx) for r in s_rows]
        o_norm = [tuple(canon(r[i]) for i in o_idx) for r in o_rows]
        if len(s_norm) != len(o_norm):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(s_norm)} oracle={len(o_norm)}")
            failures.append((name, "rowcount"))
            continue
        bad = None
        for j, (a, b) in enumerate(zip(s_norm, o_norm)):
            if a != b:
                bad = (j, a, b)
                break
        if bad:
            j, a, b = bad
            print(f"{name:28s} VALUE MISMATCH row {j}:")
            print(f"    cols : {sorted(s_cols)}")
            print(f"    spark: {a}")
            print(f"    duck : {b}")
            failures.append((name, "values"))
        else:
            print(f"{name:28s} OK ({len(s_norm)} rows)")
    print()
    if failures:
        print(f"FAILED: {len(failures)} -> {[f[0] for f in failures]}")
        sys.exit(1)
    print("ALL OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
