#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the same sf tables, load the Spark result parquet, sort
columns by name and rows by value, and diff. Usage:

    python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    if "sf0.01" not in sf_dir:
        print(f"WARNING: metadata oracles hardcode sf0.01 paths; comparing a "
              f"{sf_dir} Verify run against them would be cross-scale garbage.")
        if os.environ.get("ALLOW_SCALE_MISMATCH") != "1":
            return 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        try:
            duck_rel = con.sql(sql)
            d_cols, d_rows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
            continue
        if s_cols != d_cols:
            results[name] = f"SCHEMA-MISMATCH spark={s_cols} duck={d_cols}"
        elif len(s_rows) != len(d_rows):
            results[name] = f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}"
        elif s_rows != d_rows:
            diffs = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
            i = diffs[0]
            results[name] = (f"VALUE-MISMATCH {len(diffs)} rows differ; "
                             f"first at {i}: spark={s_rows[i]} duck={d_rows[i]}")
        else:
            results[name] = f"OK ({len(s_rows)} rows)"
    # queries with no oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json") or name in oracle:
            continue
        try:
            n = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            results[name] = f"ROWS-ONLY ({n} rows)"
        except Exception as e:
            results[name] = f"ROWS-ONLY-FAIL {e}"
    bad = 0
    for name, r in sorted(results.items()):
        flag = " " if r.startswith(("OK", "ROWS-ONLY (")) else "X"
        if flag == "X":
            bad += 1
        print(f"{flag} {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} green")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
