"""Shared graph plumbing: canonical edge frames, vertices, degrees,
dictionary encoding.

Canonical edge schema everywhere in the engine: ``src``, ``dst`` (any
orderable type — string urls or long ids). All operators accept a frame
with those two columns and are agnostic to the vertex type.

Scale notes:
- ``vertices_of`` is a union + distinct — one shuffle, done once per job
  and persisted by callers.
- ``encode_vertices`` maps arbitrary vertex keys to dense longs with a
  deterministic global ordering. Joins on 8-byte longs beat 40+-byte url
  strings in every shuffle of every iteration, so iterative algorithms
  should run on encoded edges at scale; the mapping is a one-time
  range-sort that pays for itself after ~1 iteration.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    return edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertex set, column ``id``."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: both directions, distinct, self-loops dropped."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return sym.filter(F.col("src") != F.col("dst")).distinct()


def encode_vertices(
    edges: DataFrame, partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode vertex keys to dense longs ``0..V-1``.

    Returns (encoded_edges(src:long, dst:long), mapping(id:long, key)).

    Deterministic AND distributed: a two-phase zipWithIndex — range-
    partition the sorted vertex set, count rows per partition on the
    driver (tiny: one long per partition), then assign
    ``vid = partition_offset + local_row_number`` inside ``mapInPandas``.
    No single-partition global window, so this survives 10^11 vertices.
    Same input graph → same encoding at any parallelism (bitwise-stable
    outputs across local[8]/local[32], SURVEY.md §7.3).
    """
    spark = edges.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    verts = vertices_of(edges)
    key_type = verts.schema["id"].dataType.simpleString()

    vs = (
        verts.repartitionByRange(partitions, "id")
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in vs.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"key": pdf["id"], "vid": np.array([], dtype=np.int64)})
                continue
            base = b_offsets.value[int(pdf["pid"].iloc[0])]
            vid = np.arange(seen, seen + len(pdf), dtype=np.int64) + base
            seen += len(pdf)
            yield pd.DataFrame({"key": pdf["id"].to_numpy(), "vid": vid})

    mapping = vs.mapInPandas(assign, schema=f"key {key_type}, vid long").persist()

    enc = (
        edges.join(mapping.withColumnRenamed("key", "src"), "src")
        .withColumnRenamed("vid", "src_vid")
        .join(mapping.withColumnRenamed("key", "dst"), "dst")
        .withColumnRenamed("vid", "dst_vid")
        .select(F.col("src_vid").alias("src"), F.col("dst_vid").alias("dst"))
    )
    return enc, mapping.select(F.col("vid").alias("id"), F.col("key").alias("key"))
