#!/usr/bin/env python3
"""Establish the single-node baseline: time every oracle SQL in DuckDB 1.0
against the sf0.1 parquet tables (the strongest commonly-available
single-node engine on this box) and write BASELINE.md. Usage:
  python3 tools/baseline.py <sfDir> <oracle_sql.json> > BASELINE.md
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    print("# BASELINE — single-node reference throughput")
    print()
    print(f"DuckDB {duckdb.__version__} executing each query's oracle SQL on")
    print(f"`{sf_dir}` (same parquet tables the Spark engine reads). This is")
    print("the single-node bar the Spark implementation is compared against")
    print("(BENCH_r{N}.json vs these numbers). Queries without oracle SQL")
    print("(rows-only operators) have no single-node analog and are omitted.")
    print()
    print("| query | duckdb_sec | rows |")
    print("|---|---|---|")
    total = 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            dt = time.time() - t0
            total += dt
            print(f"| {name} | {dt:.3f} | {n} |")
        except Exception as e:
            print(f"| {name} | ERROR {type(e).__name__} | - |")
    print(f"| **total** | **{total:.3f}** | |")

if __name__ == "__main__":
    main()
