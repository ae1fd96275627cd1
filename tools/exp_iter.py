"""Diagnostic harness for the scaling-efficiency investigation.

Replicates one PageRank iteration's physical plan and times its pieces
separately at a given core count, so the N-vs-4N efficiency gap can be
attributed (shuffle bytes? serial job overhead? agg scan?).

Usage: python tools/exp_iter.py <cpus> <n_edges> <iters> [conf=k:v ...]
Prints one RESULT json line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from rad_ecg_spark.operators.graph_core import free_local_checkpoint, pinned_loop_conf
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges


def main() -> None:
    cpus = int(sys.argv[1])
    n_edges = int(sys.argv[2])
    iters = int(sys.argv[3])
    extra = {}
    parts = None
    for a in sys.argv[4:]:
        if a.startswith("conf="):
            k, v = a[5:].split(":", 1)
            extra[k] = v
        elif a.startswith("parts="):
            parts = int(a[6:])
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            **extra,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    P = parts if parts is not None else cpus
    edges = (
        synth_edges(spark, n_edges, partitions=P)
        .repartition(P, "src")
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ne = edges.count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .join(
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")),
            F.col("id") == F.col("src"),
            "left",
        )
        .select("id", F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg"))
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = verts.count()
    ranks = verts.select("id", "outdeg", (F.lit(1.0) / n).alias("rank")).localCheckpoint(
        eager=True
    )
    d, base, dangling = 0.85, 0.15 / n, 0.0

    tj, ta = [], []  # checkpoint-job wall, agg-job wall
    with pinned_loop_conf(spark):
        for _ in range(iters):
            t0 = time.monotonic()
            contribs = (
                edges.join(
                    ranks.filter(F.col("outdeg") > 0).hint("shuffle_hash"),
                    edges.src == ranks.id,
                )
                .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("w"))
                .groupBy("dst")
                .agg(F.sum("w").alias("in_sum"))
            )
            newr = F.lit(base) + F.lit(d) * (
                F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(dangling / n)
            )
            new_ranks = (
                ranks.join(contribs.hint("shuffle_hash"), ranks.id == contribs.dst, "left")
                .select(
                    ranks.id,
                    ranks.outdeg,
                    newr.alias("rank"),
                    F.abs(newr - ranks.rank).alias("delta"),
                )
                .localCheckpoint(eager=True)
            )
            t1 = time.monotonic()
            row = new_ranks.agg(
                F.max("delta").alias("delta"),
                F.sum(F.when(F.col("outdeg") == 0, F.col("rank")).otherwise(0.0)).alias(
                    "dangling"
                ),
            ).collect()[0]
            t2 = time.monotonic()
            dangling = float(row["dangling"])
            free_local_checkpoint(ranks)
            ranks = new_ranks
            tj.append(round(t1 - t0, 3))
            ta.append(round(t2 - t1, 3))

    half = len(tj) // 2
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "edges": ne,
                "vertices": n,
                "conf": extra,
                "job_wall_s": tj,
                "agg_wall_s": ta,
                "steady_job_s": med(tj[half:]),
                "steady_agg_s": med(ta[half:]),
            }
        )
    )


if __name__ == "__main__":
    main()
