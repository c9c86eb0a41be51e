#!/usr/bin/env python3
"""Dev-only local mimic of the driver's t2 correctness gate.

Runs DuckDB over the oracle SQL dumped by graft.Verify and compares
row-count / schema / values against the Spark parquet output.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        got, want = norm(got), norm(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                mismatch = f"dtype[{c}] {a.dtype} vs {b.dtype}"
                break
            if not a.equals(b):
                bad = (a != b) & ~(a.isna() & b.isna())
                i = bad.idxmax()
                mismatch = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} diffs)"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"--- {len(oracle) - n_bad}/{len(oracle)} passed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
