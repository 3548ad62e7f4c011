#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet (Spark result), runs the matching SQL from
<out>/oracle_sql.json in DuckDB over the sfDir parquet tables, sorts
columns by name and rows by all columns, and diffs values.

STRICT mode (default on; set GRAFT_ORACLE_LAX=1 to disable) additionally
fails on anything the driver's value-HASH compare would catch that a
pandas `==` compare silently forgives — the r13 lesson, where three rows
were driver-red but locally green:
  * float bit differences, incl. -0.0 vs +0.0 (DuckDB round() keeps the
    sign of tiny negatives; Spark's BigDecimal round never emits -0.0);
  * dtype-family mismatches, e.g. DuckDB sum(BIGINT) -> HUGEINT which
    pandas widens to float64 while Spark emits int64 (500 vs 500.0).
Pinned local version note: duckdb 1.0.0 here; the driver's version is
unknown, so oracles must avoid version-sensitive constructs (HUGEINT
sums uncast, sign-of-zero emission, implicit decimal round types).
"""
import json
import math
import struct
import sys

import duckdb
import pandas as pd
import os

STRICT = os.environ.get("GRAFT_ORACLE_LAX", "") != "1"

# int-width WARNs (int32 vs int64) accumulated by strict_diffs so the
# final summary line surfaces drift without scanning per-query output
# (r15 ADVICE)
N_WARN = 0


def _family(dtype) -> str:
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    return "object"


def strict_diffs(g: pd.DataFrame, w: pd.DataFrame, name: str = "?") -> list:
    """Bit-level float compare + dtype-family check (driver-hash parity).

    Integer WIDTH mismatches (int32 vs int64 — e.g. a missing
    CAST(... AS INT)) are warned, not failed: the r14 driver gate was
    green on the current widths so a hard local fail would be a false
    alarm vs the driver, but the warning keeps a width drift visible
    in case the driver's value-hash ever distinguishes physical types
    (r15, ADVICE).
    """
    out = []
    for c in g.columns:
        fg, fw = _family(g[c].dtype), _family(w[c].dtype)
        if fg != fw:
            out.append(f"{c}: dtype family {g[c].dtype} vs {w[c].dtype}")
            continue
        if fg == "int" and str(g[c].dtype) != str(w[c].dtype):
            global N_WARN
            N_WARN += 1
            print(f"  WARN int width [{name}]: {c} "
                  f"{g[c].dtype} vs {w[c].dtype}")
        if fg == "float":
            a = g[c].astype("float64").to_numpy()
            b = w[c].astype("float64").to_numpy()
            for i in range(len(a)):
                x, y = a[i], b[i]
                if math.isnan(x) and math.isnan(y):
                    continue
                if struct.pack("<d", x) != struct.pack("<d", y):
                    out.append(f"{c}[{i}]: bits {x!r} vs {y!r}")
                    break
    return out

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
            if not diffs and STRICT:
                diffs = ["strict " + d for d in strict_diffs(g, w, name)]
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_bad += 1
            else:
                print(f"OK   {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_bad += 1
    print(f"[summary] {len(oracle) - n_bad}/{len(oracle)} ok, "
          f"{n_bad} bad, {N_WARN} int-width warnings")
    return n_bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
