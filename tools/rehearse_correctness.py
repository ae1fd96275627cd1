"""Rehearse the driver's CORRECTNESS gate: run every queries() entry
and its oracle at the given sf dir, print per-query PASS/FAIL + timing.

Usage: python tools/rehearse_correctness.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    import __spark_entry__ as em
    from rad_ecg_spark.session import get_spark
    from tools.compare_oracle import compare_query, duck_connection

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = em.queries(), em.oracle_sql()
    con = duck_connection(sf)
    fails = 0
    for name in queries:
        t0 = time.time()
        err = compare_query(spark, con, name, queries[name], oracles.get(name), sf)
        if err is not None:
            fails += 1
        status = "PASS" if err is None else f"FAIL: {err}"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"DONE n={len(queries)} fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
