#!/usr/bin/env python3
"""Regenerate COVERAGE.md's gate-index table from Q("...") declarations.

Scans the QueryPack sources for `Q("<name>"` sites for file:line, and takes
oracle presence from a Verify run's oracle_sql.json (the runtime truth —
parsing Scala for Some/None mis-walks parens inside SQL string literals).
Run from the repo root after a Verify dump:
  python3 scripts/gate_index.py /tmp/verify_out
"""
import json, os, re, sys, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src/main/scala/graft"
COV = ROOT / "COVERAGE.md"

oracled = set(json.load(open(
    (sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
    + "/oracle_sql.json")))

gates = {}
for f in sorted(SRC.rglob("*.scala")):
    text = f.read_text()
    for m in re.finditer(r'Q\("([a-z]+\d+_[a-z0-9_]+)"', text):
        name = m.group(1)
        lineno = text[:m.start()].count("\n") + 1
        oracle = "DuckDB" if name in oracled else "rows-only"
        rel = f.relative_to(ROOT)
        gates[name] = (f"`{rel}:{lineno}`", oracle)

def sort_key(name):
    m = re.match(r"([a-z]+)(\d+)", name)
    return (m.group(1), int(m.group(2)))

names = sorted(gates, key=sort_key)
n_total = len(names)
n_rows_only = sum(1 for n in names if gates[n][1] == "rows-only")
n_oracled = n_total - n_rows_only

rows = []
for n in names:
    loc, oracle = gates[n]
    op = n.split("_", 1)[1].replace("_", " ")
    rows.append(f"| {n} | {op} | {loc} | {oracle} |")

cov = COV.read_text().split("\n")
# locate the summary line and the table
for idx, line in enumerate(cov):
    if line.startswith("Generated from the `Q("):
        rnd = os.environ.get("SPARK_GRAFT_ROUND", "16")
        adj = "adjudication" if n_rows_only == 1 else "adjudications"
        cov[idx] = re.sub(
            r"round \d+: \d+ gates — \d+ DuckDB-oracled, \d+ closed "
            r"rows-only adjudications?",
            f"round {rnd}: {n_total} gates — {n_oracled} DuckDB-oracled, "
            f"{n_rows_only} closed rows-only {adj}",
            line)
        break
start = next(i for i, l in enumerate(cov) if l.startswith("| gate | operator |"))
end = start + 2
while end < len(cov) and cov[end].startswith("| "):
    end += 1
cov[start + 2:end] = rows
COV.write_text("\n".join(cov))
print(f"{n_total} gates ({n_oracled} oracled, {n_rows_only} rows-only)")
