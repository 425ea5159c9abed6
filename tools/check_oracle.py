#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads each <verifyOutDir>/<name> parquet dump (graft.Verify output) and the
oracle SQL from <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB over
views named after the sf tables, and compares: row count, column names (sorted),
dtypes (loose), and values (row-order-sensitive, bit-exact for floats).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exact requirement
    return norm(a) == norm(b)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    n_pass = n_fail = n_noorc = 0
    dumped = {p.name for p in out_dir.iterdir() if p.is_dir()}
    for missing in sorted(set(oracle) - dumped):
        print(f"FAIL {missing}: no parquet dump (query errored in Verify?)")
        n_fail += 1
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        try:
            spark_tbl = pq.read_table(qdir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"---- {name}: no oracle ({spark_tbl.num_rows} rows)")
            n_noorc += 1
            continue
        try:
            duck = con.sql(oracle[name])
            duck_cols = duck.columns
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue

        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_cols)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != len(duck_rows):
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={len(duck_rows)}")
            n_fail += 1
            continue

        # column-name-sorted, row-order-sensitive value compare
        s_data = {c: spark_tbl.column(c).to_pylist() for c in s_cols}
        d_idx = {c: duck_cols.index(c) for c in d_cols}
        bad = None
        for c in s_cols:
            sc = s_data[c]
            di = d_idx[c]
            for i in range(len(duck_rows)):
                if not cmp_cell(sc[i], duck_rows[i][di]):
                    bad = (c, i, sc[i], duck_rows[i][di])
                    break
            if bad:
                break
        if bad:
            c, i, sv, dv = bad
            print(f"FAIL {name}: value mismatch col={c} row={i} spark={sv!r} duck={dv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noorc} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
