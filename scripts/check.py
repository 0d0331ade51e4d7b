#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, reads the SPARK PARQUET VIA PANDAS and the
oracle result via DuckDB's `.df()` (pandas) — the same conversion layers the
driver uses — canonicalizes both frames (columns sorted by name, rows sorted
by their stringified tuple), and compares the `astype(str)` cell values.

This reproduces the driver's exact failure mode (verified round 4 against
CORRECTNESS_r03: this comparison flags precisely the driver's 13 red
queries on the round-3 HEAD, while routing both sides through DuckDB — the
old check — flagged none of them):
  - Spark DECIMAL arrives as Python Decimal ("184968.00", full scale);
    DuckDB 1.0 `.df()` converts DECIMAL to float64 ("184968.0", shortest
    repr) → string mismatch whenever a value has trailing zeros.
  - DuckDB window SUM(int) is HUGEINT → float64 ("3.0") vs Spark's int64
    ("3").
  - Timestamps are str-stable (str() hides the ns/us unit) as long as the
    sub-second part is zero.
Gate rule derived from this: no DECIMAL column may leave a gate frame —
serialize to VARCHAR on BOTH sides; cast DuckDB window sums to BIGINT.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    s = df.astype(str)
    if len(df):
        key = s.apply(lambda r: tuple(r), axis=1)
        s = s.iloc[np.argsort(key.values, kind="stable")].reset_index(drop=True)
    return s


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = canon(pd.read_parquet(files[0] if len(files) == 1 else qdir))
        if name not in oracles:
            print(f"  {name}: rows-only ({len(got)} rows)")
            continue
        exp = canon(con.sql(oracles[name]).df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} != {len(exp)}")
            failures += 1
            continue
        neq = (got != exp).any(axis=1)
        if neq.any():
            i = int(neq.idxmax())
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; "
                  f"first: got={tuple(got.iloc[i])} exp={tuple(exp.iloc[i])}")
            failures += 1
        else:
            print(f"  OK {name} ({len(got)} rows)")
    # A query that crashed during the Verify dump leaves NO output dir —
    # without this check it would silently vanish from the report.
    written = {n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracles) - written):
        print(f"FAIL {name}: no output written (query crashed in Verify)")
        failures += 1
    print(f"{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
