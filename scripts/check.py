#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, reads the Spark parquet result and the
oracle SQL from oracle_sql.json, executes the oracle in DuckDB against
the same testdata parquet tables, canonicalizes both frames (columns
sorted by name, rows sorted by all columns), and diffs values.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t)), [cols[i] for i in order]


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
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got, gcols = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracles:
            print(f"  {name}: rows-only ({len(got)} rows)")
            continue
        exp_rel = con.sql(oracles[name])
        exp, ecols = canon(exp_rel.fetchall(), exp_rel.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = [(g, e) for g, e in zip(got, exp) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; first: "
                  f"got={bad[0][0]} exp={bad[0][1]}")
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
