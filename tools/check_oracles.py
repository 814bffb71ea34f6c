#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out

Mirrors the driver contract: for each query with an oracle_sql entry, run
the SQL in DuckDB (bare table names resolve to <sfDir>/<name>.parquet via
views), load the Spark parquet result, sort columns by name, sort rows by
all columns, and compare row counts / schemas / value hashes.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import pyarrow.parquet as pq
    n_green = n_bad = n_no = 0
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json":
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK RESULT")
            n_bad += 1
            continue
        spark_df = pq.ParquetDataset(files).read().to_pandas()
        if name not in oracle_sql:
            n_no += 1
            continue
        try:
            odf = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        try:
            s, o = norm(spark_df), norm(odf)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            if rows and schema:
                # value compare with dtype tolerance (int64 vs Int64 etc.)
                eq = True
                for c in s.columns:
                    a = s[c]
                    b = o[c]
                    try:
                        if not (a.fillna("\0NULL").astype(str)
                                .equals(b.fillna("\0NULL").astype(str))):
                            eq = False
                            diffs = (a.fillna("\0NULL").astype(str)
                                     != b.fillna("\0NULL").astype(str))
                            i = diffs[diffs].index[0]
                            print(f"  {name}.{c} first diff @row {i}: "
                                  f"spark={a[i]!r} oracle={b[i]!r}")
                    except Exception as e:
                        eq = False
                        print(f"  {name}.{c} compare error: {e}")
                if eq:
                    print(f"{name}: OK ({len(s)} rows)")
                    n_green += 1
                else:
                    print(f"{name}: VALUE MISMATCH")
                    n_bad += 1
            else:
                print(f"{name}: rows {len(s)} vs {len(o)}; "
                      f"schema {list(s.columns)} vs {list(o.columns)}")
                n_bad += 1
        except Exception as e:
            print(f"{name}: COMPARE ERROR: {e}")
            n_bad += 1
    print(f"\ngreen={n_green} bad={n_bad} no_oracle={n_no}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    import os
    sys.exit(main(sys.argv[1], sys.argv[2]))
