#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet (Spark result), runs the matching SQL from
<out>/oracle_sql.json in DuckDB over the sfDir parquet tables, sorts
columns by name and rows by all columns, and diffs values.
"""
import json
import sys

import duckdb
import pandas as pd
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} "
                      f"vs {list(w.columns)}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_bad += 1
                continue
            diffs = []
            for c in g.columns:
                a, b = g[c], w[c]
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    diffs.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r} "
                                 f"(dtypes {a.dtype}/{b.dtype})")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_bad += 1
            else:
                print(f"OK   {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_bad += 1
    return n_bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
