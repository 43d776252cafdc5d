#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, and
compare (rows, schema names, sorted values). Usage:
  python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The oracle engine BASELINE.md's numbers and the float-sensitive oracles
# were validated on. ann_lsh and the PQ/IVF re-ranks lean on DuckDB 1.x's
# list_dot_product/list_cosine_similarity summing index-ascending in plain
# doubles (see the DUCKDB-VERSION SENSITIVITY note in SparkEntry.scala);
# a version that vectorizes them could flip a near-zero sign or a near-tie
# rank with NO Spark-side change. On a mismatch, triage sudden reds in
# those oracles as ORACLE-ENGINE DRIFT first, not a Spark regression.
KNOWN_GOOD_DUCKDB = "1.0.0"

def duckdb_version_banner() -> str:
    v = duckdb.__version__
    if v == KNOWN_GOOD_DUCKDB:
        return f"duckdb {v} (known-good)"
    return (f"duckdb {v} — WARNING: differs from known-good {KNOWN_GOOD_DUCKDB}; "
            "float-summation-order-sensitive oracles (ann_lsh, PQ/IVF re-ranks) "
            "may drift — triage as engine drift before suspecting Spark")

def reject_non_scalar(df: pd.DataFrame, side: str) -> None:
    """The DRIVER's comparator sorts raw and pandas crashes on array cells
    (unhashable ndarray) — r14's embedding_jl red. This local gate used to
    stringify-before-sort, silently passing what the driver rejects; now a
    non-scalar cell in any oracled output is a loud local failure."""
    import numpy as np
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            bad = s.map(lambda v: isinstance(v, (list, tuple, set, dict, np.ndarray)))
            if bad.any():
                raise TypeError(
                    f"non-scalar {side} column '{c}' (e.g. "
                    f"{type(s[bad.idxmax()]).__name__}) — the driver comparator "
                    "crashes on array cells; explode to scalar rows "
                    "(embedding_pca precedent)")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str) \
                .str.replace(" 00:00:00", "", regex=False) \
                .replace("NaT", "<NULL>")
        elif s.dtype == object:
            df[c] = s.map(lambda v: "<NULL>" if v is None or v is pd.NaT
                          else str(v).replace(" 00:00:00", ""))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "<NULL>" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(str)
        else:
            df[c] = s.map(lambda v: "<NULL>" if pd.isna(v) else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    print(duckdb_version_banner())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).df()
            reject_non_scalar(spark_df, "spark")
            reject_non_scalar(duck_df, "oracle")
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
                n_fail += 1
                continue
            neq = (a != b)
            if neq.any().any():
                bad_cols = [c for c in a.columns if neq[c].any()]
                i = neq.any(axis=1).idxmax()
                print(f"FAIL {name}: value mismatch cols={bad_cols} first_row={i}")
                print("  spark :", a.iloc[i].to_dict())
                print("  oracle:", b.iloc[i].to_dict())
                n_fail += 1
                continue
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail ({duckdb_version_banner()})")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
