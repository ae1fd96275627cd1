"""Extra benchmarks for optimization work (guide §1.4): per-query
noop-sink isolation timing + .explain("formatted") dumps.

bench.py is FROZEN for measurement (driver contract); this file holds
the round-6 working measurements. Usage:

    python bench_extra.py time  <sf_dir> <repeats> [query ...]
    python bench_extra.py plan  <sf_dir> <outdir>  [query ...]

`time` prints per-query best/median wall seconds using the noop sink
(computes every column of every row, discards the result — unlike
.count(), which can prune). The driver's bench uses .count(); both are
reported so numbers stay comparable with BENCH_r05.
`plan` writes <outdir>/<query>.txt with explain("formatted").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rad_ecg_spark.session import get_spark  # noqa: E402


def main() -> int:
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rad_ecg_spark.queries import ALL_QUERIES

    if mode == "time":
        repeats = int(sys.argv[3])
        names = sys.argv[4:] or list(ALL_QUERIES)
        with open("/proc/loadavg") as f:
            print(f"load1_start={f.read().split()[0]}")
        for name in names:
            fn = ALL_QUERIES[name]
            runs_count, runs_noop = [], []
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"{name}: count")
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                runs_count.append(time.monotonic() - t0)
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs_noop.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
            fmt = lambda rs: "/".join(f"{r:.2f}" for r in sorted(rs))
            print(
                f"{name}: count[{fmt(runs_count)}] noop[{fmt(runs_noop)}]",
                flush=True,
            )
        with open("/proc/loadavg") as f:
            print(f"load1_end={f.read().split()[0]}")
    elif mode == "plan":
        outdir = sys.argv[3]
        names = sys.argv[4:] or list(ALL_QUERIES)
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = ALL_QUERIES[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(p)
            print(f"wrote {outdir}/{name}.txt", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
