#!/usr/bin/env python3
"""Iterate on one oracle SQL against an existing Verify dump.

Usage: python3 tools/try_oracle.py <name> <sqlfile> [verify_out_dir] [sf_dir]

Same canonicalization/compare as check_correctness.py, but for a single
query with the SQL read from a file — fast loop while authoring oracles.
"""
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]


def val_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def main():
    name, sqlfile = sys.argv[1], sys.argv[2]
    out_dir = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("/tmp/verify_out")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    sql = Path(sqlfile).read_text()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    got_rel = con.sql(f"SELECT * FROM '{out_dir / name}/*.parquet'")
    got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
    exp_rel = con.sql(sql)
    exp_rows, exp_cols = canon(exp_rel.fetchall(), exp_rel.columns)
    if got_cols != exp_cols:
        print(f"FAIL cols:\n  got {got_cols}\n  exp {exp_cols}")
        sys.exit(1)
    if len(got_rows) != len(exp_rows):
        print(f"FAIL rowcount {len(got_rows)} != {len(exp_rows)}")
        for i in range(min(5, max(len(got_rows), len(exp_rows)))):
            g = got_rows[i] if i < len(got_rows) else None
            e = exp_rows[i] if i < len(exp_rows) else None
            print(f"  [{i}] got {g}\n      exp {e}")
        sys.exit(1)
    nbad = 0
    for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
        if not all(val_eq(a, b) for a, b in zip(g, e)):
            if nbad < 5:
                print(f"row {i}:\n  got {g}\n  exp {e}")
            nbad += 1
    if nbad:
        print(f"FAIL {nbad}/{len(got_rows)} rows differ")
        sys.exit(1)
    print(f"PASS {name} ({len(got_rows)} rows)")


if __name__ == "__main__":
    main()
