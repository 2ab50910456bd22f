#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB against the same parquet tables, sort
columns by name and rows by all columns, and compare values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for robust compare (floats via repr at 12 sig digits)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows)"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: column mismatch {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"✗ {name}: row count {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        diffs = []
        type_diffs = []
        for c in a.columns:
            av, bv = a[c], b[c]
            # The driver's compare hashes typed value representations, so a
            # dtype mismatch (e.g. DuckDB HUGEINT->float64 vs Spark int64)
            # is a FAIL even when the numbers agree. Mirror that: dtype kind
            # must match before values are compared.
            if av.dtype.kind != bv.dtype.kind:
                type_diffs.append((c, str(av.dtype), str(bv.dtype)))
                continue
            try:
                if av.dtype.kind in "fc":
                    import numpy as np
                    ok = np.allclose(av.astype(float).fillna(-9e99),
                                     bv.astype(float).fillna(-9e99),
                                     rtol=1e-9, atol=1e-9)
                else:
                    ok = av.astype(str).equals(bv.astype(str))
            except Exception:
                ok = av.astype(str).equals(bv.astype(str))
            if not ok:
                diffs.append(c)
        if type_diffs:
            print(f"✗ {name}: dtype mismatch {type_diffs}")
            n_fail += 1
            continue
        if diffs:
            print(f"✗ {name}: value mismatch in columns {diffs}")
            for c in diffs[:2]:
                mask = a[c].astype(str) != b[c].astype(str)
                print(a[mask].head(3))
                print(b[mask].head(3))
            n_fail += 1
        else:
            print(f"✓ {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
