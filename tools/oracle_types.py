#!/usr/bin/env python3
"""Oracle output-type sweep: DESCRIBE every oracle SQL in a graft.Verify dump
and fail on any HUGEINT/UHUGEINT output column. DuckDB promotes windowed and
grouped SUM(BIGINT) and `//` to HUGEINT, and the driver's hash gate
canonicalizes types, not just values — an uncast column hash-fails even when
every value matches (r16: q149/q152). Usage: oracle_types.py <sfDir> <verifyOutDir>"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = []
    for name in sorted(oracles):
        try:
            cols = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"{name:28s} DESCRIBE ERROR: {e}")
            bad.append((name, f"describe error: {e}"))
            continue
        huge = [(c[0], c[1]) for c in cols if "HUGEINT" in c[1].upper()]
        if huge:
            print(f"{name:28s} HUGEINT columns: {huge}")
            bad.append((name, huge))
    print(f"\n{len(oracles)} oracles swept, {len(bad)} with HUGEINT/error")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
