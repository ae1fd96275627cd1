"""Deterministic synthetic edge tables at bench scale — pure JVM-side
arithmetic (xxhash64 over spark.range), no Python in the loop, so a
10^7-edge table materializes in seconds and the same (seed, E, V) always
yields the same graph at any parallelism.

Degree distribution: 90% uniform targets + 10% routed to a 100-vertex
hub set — the power-law-ish supernode skew the north_rule requires the
engine to survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int | None = None,
    hub_fraction_pct: int = 10,
    n_hubs: int = 100,
    partitions: int | None = None,
    seed: int = 42,
) -> DataFrame:
    if n_vertices is None:
        n_vertices = max(10, n_edges // 10)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = spark.range(0, n_edges, 1, partitions)
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))  # noqa: E731
    src = h(13) % n_vertices
    uniform_dst = h(17) % n_vertices
    hub_dst = h(19) % n_hubs
    dst = F.when(h(23) % 100 < hub_fraction_pct, hub_dst).otherwise(uniform_dst)
    return (
        base.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
