"""Synchronous label propagation with deterministic min-label tie-break.

Every vertex starts labeled with its own id; each round every vertex
simultaneously adopts the most frequent label among its neighbors,
breaking frequency ties by the SMALLEST label (not hash order) — that is
what makes the output identical at any parallelism (local[8] == local[32]
bitwise, SURVEY.md §7.3).

One round = one join (labels onto the symmetric edge list) + one
groupBy(dst,label).count + one per-dst argmax. The argmax is a max_by on
a packed (count, -label) struct rather than a window row_number —
a window would sort every (dst) group; max_by is a single hash-agg pass
with partial aggregation, the skew-safe choice for supernodes.

Reference capability donor: mode aggregation with deterministic pick
(/root/reference/src/rad_ecg/scripts/porcine/pig_extract.py:1007) and
bounded-round iteration (peak_detect_v4.py:1733-1756).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from rad_ecg_spark.operators.graph_core import (
    free_local_checkpoint,
    normalize_edges,
    pinned_loop_conf,
    size_partitions,
    symmetrize,
    vertices_of,
)


@dataclass
class LabelPropStats:
    iterations: int = 0
    changes: list[int] = field(default_factory=list)
    converged: bool = False


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    num_partitions: int | None = None,
    stats: LabelPropStats | None = None,
) -> DataFrame:
    """DataFrame(id, label). Converges when no vertex changes label
    (synchronous LP can 2-cycle on bipartite structures — max_iter bounds
    that; the fixed iteration count is itself deterministic)."""
    spark = edges.sparkSession
    if stats is None:
        stats = LabelPropStats()

    sym0 = symmetrize(normalize_edges(edges)).persist(StorageLevel.MEMORY_AND_DISK)
    if num_partitions is None:
        num_partitions = size_partitions(spark, sym0.count())
    sym = (
        sym0.repartition(num_partitions, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()
    sym0.unpersist()
    verts = vertices_of(edges).repartition(num_partitions, "id").persist()
    labels = verts.select("id", F.col("id").alias("label")).persist()

    with pinned_loop_conf(spark):
      for it in range(max_iter):
        # messages flow src -> dst; join on src, aggregate per dst
        msgs = sym.join(labels, sym.src == labels.id).select("dst", "label")
        counts = msgs.groupBy("dst", "label").agg(F.count(F.lit(1)).alias("cnt"))
        # argmax by (cnt desc, label asc): min_by over struct(-cnt, label)
        best = counts.groupBy("dst").agg(
            F.min_by("label", F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias(
                "new_label"
            )
        )
        new_labels = (
            verts.join(best, verts.id == best.dst, "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("id")).alias("label"),
            )
            # truncate lineage every iteration: the new-labels plan embeds
            # the old-labels plan multiple times; without this the logical
            # plan grows exponentially (see operators/pagerank.py doc).
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select(F.col("id").alias("oid"), F.col("label").alias("old")),
                new_labels.id == F.col("oid"),
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        free_local_checkpoint(labels)
        labels = new_labels
        stats.iterations = it + 1
        stats.changes.append(changed)
        if changed == 0:
            stats.converged = True
            break

    sym.unpersist()
    verts.unpersist()
    return labels.select("id", "label")
