#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the same sf tables, load the Spark result parquet, sort
columns by name and rows by value, and diff — TYPES INCLUDED.

The r16 lesson: the driver's hash is type-aware, so an oracle whose final
projection is an uncast aggregate (DuckDB sum(BIGINT) -> HUGEINT, Arrow
decimal128(38,0)) hash-mismatches a numerically equal Spark BIGINT. A
stringified compare is blind to that. This gate therefore
  1. compares the DuckDB-surfaced column TYPES of both sides (the Spark
     parquet read and the oracle result go through the same connection,
     so a type difference here is exactly the class the driver sees), and
  2. lints every oracle via DESCRIBE: any HUGEINT/UHUGEINT output column
     fails outright, because Spark cannot produce that type.

Usage:

    python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Type renderings that differ only in how the two readers surface the same
# logical value class; everything else must match exactly.
_TYPE_ALIASES = {
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "TIMESTAMP_NS": "TIMESTAMP",
}


def norm_type(t):
    s = str(t)
    return _TYPE_ALIASES.get(s, s)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)


def canon(rel):
    cols = rel.columns
    types = [norm_type(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return ([cols[i] for i in order], [types[i] for i in order], out)


def lint_oracle(con, name, sql):
    """DESCRIBE the oracle and reject output types Spark can never emit.

    HUGEINT comes from DuckDB's sum(BIGINT)/product() widening; Spark has
    no 128-bit integer, so a HUGEINT column in the final projection is
    always an oracle bug (missing CAST), never a real value difference.
    """
    try:
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
    except Exception:
        return None  # the run itself will report the failure
    bad = [(c, t) for (c, t, *_rest) in desc
           if "HUGEINT" in str(t).upper()]
    if bad:
        return ("ORACLE-LINT: HUGEINT in final projection "
                f"(wrap in CAST(... AS BIGINT)): {bad}")
    return None


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
        lint = lint_oracle(con, name, sql)
        if lint:
            results[name] = lint
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_types, s_rows = canon(spark_rel)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        try:
            duck_rel = con.sql(sql)
            d_cols, d_types, d_rows = canon(duck_rel)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
            continue
        if s_cols != d_cols:
            results[name] = f"SCHEMA-MISMATCH spark={s_cols} duck={d_cols}"
        elif s_types != d_types:
            diffs = [(c, a, b) for c, a, b in zip(s_cols, s_types, d_types)
                     if a != b]
            results[name] = f"TYPE-MISMATCH (spark, duck): {diffs}"
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
