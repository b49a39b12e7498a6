#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the sf
tables, and compares values column-sorted (like the driver). Dev tool
only — the Scala library has no Python dependency.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.types as pat

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            cols = sorted(spark_tbl.column_names)
            spark_rows = [tuple(norm(r[c]) for c in cols)
                          for r in spark_tbl.to_pylist()]
            duck_tbl = con.sql(sql).arrow()
            dcols = sorted(duck_tbl.column_names)
            duck_rows = [tuple(norm(r[c]) for c in dcols)
                         for r in duck_tbl.to_pylist()]
            # The driver hashes TYPED values, so a DuckDB HUGEINT
            # (bare SUM over integers -> arrow decimal128) mismatches a
            # Spark int64 even when every value is equal; Python's
            # int == Decimal comparison below would hide that (d39/q58
            # defect class). Surface it as a hard type failure.
            ducktypes = {f.name: f.type for f in duck_tbl.schema}
            sparktypes = {f.name: f.type for f in spark_tbl.schema}
            tmism = [c for c in dcols
                     if c in sparktypes
                     and pat.is_decimal(ducktypes[c])
                     and not pat.is_decimal(sparktypes[c])]
            if tmism:
                print(f"FAIL {name}: oracle decimal128 vs spark "
                      f"{[(c, str(sparktypes[c])) for c in tmism]} — "
                      "CAST the oracle aggregate (AS BIGINT/DOUBLE)")
                n_bad += 1
            elif cols != dcols:
                print(f"FAIL {name}: columns {cols} vs {dcols}")
                n_bad += 1
            elif spark_rows != duck_rows:
                n_bad += 1
                print(f"FAIL {name}: rows {len(spark_rows)} vs {len(duck_rows)}")
                for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                    if a != b:
                        print(f"  first diff at row {i}:\n   spark={a}\n   duck ={b}")
                        break
            else:
                print(f"ok   {name} ({len(spark_rows)} rows)")
                n_ok += 1
        except Exception as e:
            n_bad += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
