#!/usr/bin/env python3
"""Self-check: compare graft.Verify parquet dumps against the DuckDB oracle,
mimicking the driver's correctness gate (column-name-sorted, row-sorted value
compare). Usage: check_oracle.py <verify_out_dir> [sf_dir]"""
import json, sys, glob, os
import duckdb
import pandas as pd

out_dir = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: v.decode() if isinstance(v, bytes) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

ok = fail = 0
for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
    name = os.path.basename(d)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")],
                         ignore_index=True)
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    duck_df = con.sql(oracle[name]).df()
    a, b = normalize(spark_df), normalize(duck_df)
    status = []
    if list(a.columns) != list(b.columns):
        status.append(f"SCHEMA spark={list(a.columns)} duck={list(b.columns)}")
    elif len(a) != len(b):
        status.append(f"ROWS spark={len(a)} duck={len(b)}")
    else:
        # the driver hashes rendered values, so int64 vs float64 (e.g. a
        # DuckDB HUGEINT sum) is a mismatch even when numerically equal
        for c in a.columns:
            ka, kb = a[c].dtype.kind, b[c].dtype.kind
            if {ka, kb} == {"i", "f"}:
                status.append(f"DTYPE {c}: spark={a[c].dtype} duck={b[c].dtype}")
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        except AssertionError as e:
            status.append("VALUES " + str(e).split("\n")[0])
    if status:
        fail += 1
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        ok += 1
        print(f"  ok {name} ({len(a)} rows)")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
