"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (derived link graph -> PageRank ->
top customers by rank). ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 with DuckDB-checkable semantics
(see rad_ecg_spark/queries/__init__.py for the float-determinism
policy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: edge table derived from orders -> PageRank to 1e-6 ->
    top-20 vertices joined back to customer names.

    Runs at sf0.1 by default (bench scale — the driver's entry exercise
    should drive the engine, not a 1.4k-edge toy); override with
    SPARK_GRAFT_ENTRY_SF_DIR for smoke runs on smaller data."""
    import os

    from rad_ecg_spark.operators.pagerank import pagerank
    from rad_ecg_spark.queries.graph import derived_edges

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.1")
    edges = derived_edges(spark, sf_dir)
    ranks = pagerank(edges, tol=1e-6, max_iter=60)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        ranks.join(cust, ranks.id == cust.c_custkey, "left")
        .select("id", "rank", "c_name", "c_mktsegment")
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rad_ecg_spark.queries import ALL_QUERIES

    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    from rad_ecg_spark.queries import ALL_ORACLES

    return dict(ALL_ORACLES)
