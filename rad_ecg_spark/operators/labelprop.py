"""Synchronous label propagation with deterministic min-label tie-break.

Every vertex starts labeled with its own id; each round every vertex
simultaneously adopts the most frequent label among its neighbors,
breaking frequency ties by the SMALLEST label (not hash order) — that is
what makes the output identical at any parallelism (local[8] == local[32]
bitwise, SURVEY.md §7.3).

Loop discipline (same as operators/pagerank.py — measured there):
- the symmetric edge table is hash-partitioned by ``src`` ONCE and
  persisted; the per-round labels join (sym.src == labels.id) is
  co-partitioned with a shuffle_hash hint, so the 2|E| edge rows are
  never re-shuffled or re-sorted inside the loop;
- ONE exchange per round: messages repartition(P, dst). Both mode
  aggregations (groupBy(dst,label) then argmax per dst) run on that
  partitioning with no further exchange (HashPartitioning(dst) satisfies
  the (dst,label) grouping — the subset rule);
- the join of the per-dst argmax back onto labels is co-partitioned
  (HashPartitioning(dst) vs HashPartitioning(id), same count) — no
  exchange;
- change detection is a COLUMN (`changed`), not a self-join: the new
  state row carries old-vs-new inline and one aggregate scan returns the
  round's change count — the driver holds a single scalar;
- the argmax is min_by over a packed (-cnt, label) struct, a single
  hash-agg with partial aggregation — skew-safe for supernodes (a
  window row_number would sort every dst group);
- localCheckpoint every round truncates the exponentially-growing plan;
  superseded checkpoint blocks are freed explicitly.

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
    iter_wall_s: list[float] = field(default_factory=list)
    converged: bool = False


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    num_partitions: int | None = None,
    stats: LabelPropStats | None = None,
    hub_degree_threshold: int | None = None,
) -> DataFrame:
    """DataFrame(id, label). Converges when no vertex changes label
    (synchronous LP can 2-cycle on bipartite structures — max_iter bounds
    that; the fixed iteration count is itself deterministic).

    ``hub_degree_threshold``: same supernode split as
    operators/pagerank.py — symmetric-degree hubs keep their edges in
    balanced natural partitioning and join a BROADCAST slice of the
    label state each round, while residual edges keep the
    co-partitioned shuffle-hash path with per-key rows bounded by the
    threshold. Unlike PageRank's float contributions, LP messages are
    exact (dst, label) rows feeding an integer count, so the split
    output is BITWISE identical to the unsplit plan (asserted in
    tests), not merely 1e-12-close.
    """
    import time as _time

    spark = edges.sparkSession
    if stats is None:
        stats = LabelPropStats()

    sym0 = symmetrize(normalize_edges(edges)).persist(StorageLevel.MEMORY_AND_DISK)
    if num_partitions is None:
        num_partitions = size_partitions(spark, sym0.count())
    sym = (
        sym0.repartition(num_partitions, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()
    sym0.unpersist()

    residual = hub_edges = hub_ids = None
    if hub_degree_threshold is not None:
        from rad_ecg_spark.operators.skew import split_hub_edges

        residual, hub_edges, hub_ids = split_hub_edges(sym, hub_degree_threshold)
        residual = residual.persist(StorageLevel.MEMORY_AND_DISK)
        hub_edges = hub_edges.repartition(num_partitions).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        hub_ids = hub_ids.persist()
        residual.count(), hub_edges.count(), hub_ids.count()
    # select BEFORE repartition: localCheckpoint records only the FIRST
    # partitioning of a PartitioningCollection, and selecting
    # id->label AFTER the repartition makes that hash(label), which the
    # loop's join on id can't reuse (measured: one extra vertex-sized
    # exchange per round).
    labels = (
        vertices_of(edges)
        .select("id", F.col("id").alias("label"))
        .repartition(num_partitions, "id")
        # lazy: round 1's join materializes it
        .localCheckpoint(eager=False)
    )

    with pinned_loop_conf(spark, num_partitions):
      for it in range(max_iter):
        t_iter = _time.monotonic()
        # messages flow src -> dst; the join is co-partitioned (sym by
        # src, labels by id), shuffle_hash builds over the labels slice.
        if residual is None:
            msgs = sym.join(
                labels.hint("shuffle_hash"), sym.src == labels.id
            ).select("dst", "label")
        else:
            # supernode path: hub edges (balanced partitioning) join a
            # broadcast label slice (<= 2|E|/threshold rows); residual
            # keeps the co-partitioned path with bounded per-key rows
            hub_slice = labels.join(F.broadcast(hub_ids), "id", "left_semi")
            m_rest = residual.join(
                labels.hint("shuffle_hash"), residual.src == labels.id
            ).select("dst", "label")
            m_hub = hub_edges.join(
                F.broadcast(hub_slice), hub_edges.src == F.col("id")
            ).select("dst", "label")
            msgs = m_rest.unionByName(m_hub)
        # THE round's single exchange; both groupBys below are satisfied
        # by HashPartitioning(dst) (subset rule) — no further shuffle.
        counts = (
            msgs.repartition(num_partitions, "dst")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt desc, label asc): min_by over struct(-cnt, label).
        # Round-6 audit note: the struct buffer makes this a partial+final
        # SortAggregate pair (not hash-aggregable). Two rewrites were
        # measured and REJECTED: max-then-filter-then-min re-planned the
        # equality filter into the join key (5 live exchanges/round), and
        # a decimal-packed max (hash-aggregable) timed identical to
        # min_by at 3M messages/round (0.48-0.52 s both) — the sort runs
        # on the post-exchange partition stream and is not the wall.
        best = counts.groupBy("dst").agg(
            F.min_by("label", F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias(
                "new_label"
            )
        )
        new_labels = (
            labels.join(best.hint("shuffle_hash"), labels.id == best.dst, "left")
            .select(
                labels.id,
                F.coalesce(F.col("new_label"), labels.label).alias("label"),
                # change detection inline — no self-join, one agg scan
                (F.coalesce(F.col("new_label"), labels.label) != labels.label)
                .cast("long")
                .alias("changed"),
            )
            # truncate lineage every iteration (see operators/pagerank.py);
            # lazy: the changed-count agg below materializes it (one job)
            .localCheckpoint(eager=False)
        )
        # coalesce: sum over zero rows is NULL (empty vertex set)
        changed = int(
            new_labels.agg(
                F.coalesce(F.sum("changed"), F.lit(0))
            ).collect()[0][0]
        )
        free_local_checkpoint(labels)
        labels = new_labels
        stats.iterations = it + 1
        stats.changes.append(changed)
        stats.iter_wall_s.append(round(_time.monotonic() - t_iter, 3))
        if changed == 0:
            stats.converged = True
            break

    sym.unpersist()
    # mirror pagerank's cleanup: without this the hub-split path leaked
    # ~2|E|+ cached rows per call in a long-lived driver (ADVICE r05),
    # and in run_pipeline the leaked blocks squat on storage while
    # components/triangles run afterwards in the same session
    for df in (residual, hub_edges, hub_ids):
        if df is not None:
            df.unpersist()
    return labels.select("id", "label")
