#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

For each <name> subdir (Spark parquet result) with an entry in
oracle_sql.json: run the SQL in DuckDB against views over the sfDir
tables, then compare row count, column names (sorted), and the full
multiset of rows (sorted by all columns, name-sorted column order).
Exact equality — no tolerances — matching the hash-based driver gate.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(repr(v) for v in row))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            bad.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            bad.append((name, f"oracle failed: {e}"))
            continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            bad.append((name, f"columns differ: spark={g_cols} oracle={e_cols}"))
            continue
        if len(got) != len(exp):
            bad.append((name, f"rows differ: spark={len(got)} oracle={len(exp)}"))
            continue
        g = canon(got[g_cols].itertuples(index=False, name=None))
        e = canon(exp[e_cols].itertuples(index=False, name=None))
        if g != e:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
            bad.append((name, f"values differ at sorted-row {diff[0]}:\n  spark={diff[1]}\n  oracl={diff[2]}"))
            continue
        ok.append(name)

    for name in ok:
        print(f"  OK   {name}")
    for name, why in bad:
        print(f"  FAIL {name}: {why}")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} oracle keys match")
    # a SPARK_GRAFT_VERIFY_KEYS run leaves a `_filtered` marker: its
    # oracle_sql.json covers only the filtered keys, so "N/N match"
    # here is NOT the full gate — say so instead of letting a partial
    # rewrite of a full-dump dir read as complete coverage
    import os
    marker = os.path.join(out_dir, "_filtered")
    if os.path.exists(marker):
        with open(marker) as f:
            print(f"  NOTE: FILTERED run ({f.read().strip()}) — not the full gate")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
