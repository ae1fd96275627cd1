"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import decimal
    import math

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_query(spark, con, name, fn, sql, sf_dir) -> str | None:
    """None = pass; otherwise a failure description."""
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
    except Exception as e:  # noqa: BLE001
        return f"spark error: {str(e)[:300]}"
    if sql is None:
        return None  # rows-only check
    try:
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:  # noqa: BLE001
        return f"duckdb error: {str(e)[:300]}"
    if [c.lower() for c in scols] != [c.lower() for c in ocols]:
        return f"columns {scols} vs {ocols}"
    if len(srows) != len(orows):
        return f"rowcount {len(srows)} vs {len(orows)}"
    order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    s_set = sorted(tuple(norm_cell(r[i]) for i in order) for r in srows)
    o_set = sorted(tuple(norm_cell(r[i]) for i in order) for r in orows)
    if s_set != o_set:
        ndiff = sum(1 for a, b in zip(s_set, o_set) if a != b)
        first = next((a, b) for a, b in zip(s_set, o_set) if a != b)
        return f"{ndiff} differing rows; first: spark={first[0]} oracle={first[1]}"
    return None


def main() -> int:
    sys.path.insert(0, ".")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from rad_ecg_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        err = compare_query(spark, con, name, fn, oracles.get(name), sf_dir)
        if err:
            failures.append(name)
            print(f"FAIL {name}: {err}")
        else:
            suffix = "" if name in oracles else " (rows-only)"
            print(f"PASS {name}{suffix}")
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
