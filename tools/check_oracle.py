#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <outDir> <sfDir>
Reads each <outDir>/<name>/ parquet dir (written by graft.Verify) and
compares row-for-row against the corresponding oracle SQL from
<outDir>/oracle_sql.json run in DuckDB over <sfDir>/*.parquet.
Columns are sorted by name, rows sorted by all columns (driver-style).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = canon(pd.concat(
            [pd.read_parquet(f) for f in glob.glob(os.path.join(outdir, name, "*.parquet"))]))
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
    try:
        duck_df = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
    ok_shape = spark_df.shape == duck_df.shape and list(spark_df.columns) == list(duck_df.columns)
    if not ok_shape:
        print(f"FAIL {name}: shape/cols spark={spark_df.shape}{list(spark_df.columns)} duck={duck_df.shape}{list(duck_df.columns)}")
        n_fail += 1; continue
    diff = []
    for c in spark_df.columns:
        a, b = spark_df[c].values, duck_df[c].values
        # Driver hashes stringified values, so int64 vs float64 ("300" vs
        # "300.0") is a real mismatch even when numerically equal.
        a_f = np.issubdtype(spark_df[c].dtype, np.floating)
        b_f = np.issubdtype(duck_df[c].dtype, np.floating)
        if a_f != b_f:
            print(f"   dtype drift col {c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
            diff.append(c); continue
        if a_f or b_f:
            # normalize -0.0 to 0.0: the driver hashes STRINGIFIED values
            # where '-0.0' != '0.0', so exact float equality alone would
            # pass a case the driver fails
            af = a.astype(float) + 0.0
            bf = b.astype(float) + 0.0
            exact = np.allclose(af, bf, rtol=0, atol=0, equal_nan=True) and \
                (np.signbit(af) == np.signbit(bf)).all()
        else:
            exact = (a == b).all()
        if not exact:
            diff.append(c)
    if diff:
        print(f"FAIL {name}: value mismatch in {diff}")
        for c in diff[:2]:
            # dtype-drift columns can be numerically equal row-for-row, so
            # print dtypes + leading raw values unconditionally instead of
            # relying on elementwise !=
            print(f"   col {c}: spark dtype={spark_df[c].dtype} duck dtype={duck_df[c].dtype}")
            m = spark_df[c].values != duck_df[c].values
            idx = np.where(m)[0][:3] if m.any() else np.arange(min(3, len(spark_df)))
            for i in idx:
                print(f"   row {i} col {c}: spark={spark_df[c].values[i]!r} duck={duck_df[c].values[i]!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
