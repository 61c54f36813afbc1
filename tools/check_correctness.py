#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet dump written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the sf
parquet tables, and compares (schema-insensitively: columns sorted by
name, rows sorted by all columns, values compared with float tolerance).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
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
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out_dir / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
        try:
            exp_rel = con.sql(oracle[name])
            exp_rows, exp_cols = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if not all(val_eq(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  got {bad[1]}\n  exp {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    for qdir in sorted(out_dir.iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
            print(f"ROWS {qdir.name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
