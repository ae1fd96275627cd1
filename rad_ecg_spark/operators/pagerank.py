"""PageRank: power iteration with dangling-mass redistribution.

Semantics (matches the standard Brin-Page formulation and the NumPy
oracle in tests/oracles.py):

    rank_{k+1}(v) = (1-d)/N + d * ( sum_{u->v} rank_k(u)/outdeg(u)
                                    + dangling_mass_k / N )
    dangling_mass_k = sum of rank_k over vertices with outdeg == 0
    converged when  max_v |rank_{k+1}(v) - rank_k(v)| < tol

Scale design (the part that must survive 10^12 documents):
- ONE shuffle per iteration. Edges are hash-partitioned by ``src`` once
  and persisted; ranks come out of each iteration hash-partitioned by
  vertex id (the groupBy("dst") output), so the next iteration's
  edges⋈ranks join reuses both partitionings with no Exchange. The only
  mandatory shuffle is the contribution groupBy("dst") — that IS the
  message-passing step.
- Partial (map-side) aggregation makes the groupBy-sum skew-tolerant:
  a supernode dst key reduces to one partial row per map partition
  before the shuffle, so a 10^8-in-degree hub costs P partial rows, not
  10^8 shuffled rows. AQE skew-join handles src-side skew in the join.
- Driver holds only 3 scalars per iteration (delta, dangling mass, sum);
  nothing vertex-sized is ever collected.
- Lineage is cut with localCheckpoint EVERY iteration (the reference
  never faces this — its state is a mutable array). This is not
  optional: the new-ranks plan references the old-ranks plan ~3× (join,
  dangling term, delta), so without truncation the logical plan grows
  exponentially and Catalyst analysis time explodes after ~6 iterations
  (measured: 2.4s/iter → 140s/iter by iteration 8). persist() alone
  does NOT help — it caches execution, not the logical plan.
- Optional durable checkpointing via plans.checkpoint.CheckpointManager:
  per-iteration snapshot + _meta lineage row; ``resume=True`` restarts
  from the last complete iteration (north_rule requirement).

Reference capability donor: history-driven iteration with convergence
gating (/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:1733-1756)
and skip-if-done resume (peak_detect_v4.py:1850-1853).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from rad_ecg_spark.operators.graph_core import normalize_edges, out_degrees, vertices_of
from rad_ecg_spark.plans.checkpoint import CheckpointManager


@dataclass
class PageRankStats:
    iterations: int = 0
    deltas: list[float] = field(default_factory=list)
    converged: bool = False
    num_vertices: int = 0
    num_edges: int = 0
    resumed_from: int | None = None


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    stats: PageRankStats | None = None,
    dedupe_edges: bool = True,
) -> DataFrame:
    """Returns DataFrame(id, rank). ``edges`` needs columns src, dst.

    Ranks sum to 1.0 at every iteration (dangling mass redistributed).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if stats is None:
        stats = PageRankStats()

    edges = normalize_edges(edges)
    if dedupe_edges:
        # PageRank is defined over an edge SET; duplicate (src,dst) rows
        # would silently inflate outdeg. One-time cost before the loop.
        edges = edges.dropDuplicates(["src", "dst"])
    edges = (
        edges.repartition(num_partitions, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # vertex table carries the static outdeg so the per-iteration loop
    # never re-joins a separate degree table.
    verts = (
        vertices_of(edges)
        .join(out_degrees(edges), F.col("id") == F.col("src"), "left")
        .select("id", F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg"))
        .repartition(num_partitions, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = verts.count()
    stats.num_vertices = n
    stats.num_edges = edges.count()
    if n == 0:
        return verts.select("id", F.lit(0.0).alias("rank"))

    start_iter = 0
    ranks = None
    if resume and checkpointer is not None:
        last = checkpointer.last_complete()
        if last is not None:
            start_iter = last
            stats.resumed_from = last
            loaded = checkpointer.load_state(last).select(
                F.col("id").alias("cid"), "rank"
            )
            ranks = (
                verts.join(loaded, verts.id == F.col("cid"))
                .select("id", "outdeg", "rank")
                .repartition(num_partitions, "id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
    if ranks is None:
        ranks = verts.select(
            "id", "outdeg", (F.lit(1.0) / F.lit(float(n))).alias("rank")
        ).persist(StorageLevel.MEMORY_AND_DISK)

    # one action to seed the loop's dangling mass
    dangling = ranks.filter(F.col("outdeg") == 0).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0))
    ).collect()[0][0]

    d = float(damping)
    base = (1.0 - d) / n
    for it in range(start_iter, max_iter):
        contribs = (
            edges.join(ranks.filter(F.col("outdeg") > 0), edges.src == ranks.id)
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("in_sum"))
        )
        new_ranks = (
            verts.join(contribs, verts.id == contribs.dst, "left")
            .select(
                verts.id,
                verts.outdeg,
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            # materialize AND truncate the logical plan — see module doc.
            .localCheckpoint(eager=True)
        )
        # single action per iteration: convergence delta + next dangling
        # mass + total mass, fused into one aggregate over one join.
        row = (
            new_ranks.join(
                ranks.select(F.col("id").alias("oid"), F.col("rank").alias("old_rank")),
                new_ranks.id == F.col("oid"),
            )
            .agg(
                F.max(F.abs(F.col("rank") - F.col("old_rank"))).alias("delta"),
                F.sum(F.when(F.col("outdeg") == 0, F.col("rank")).otherwise(0.0)).alias(
                    "dangling"
                ),
                F.sum("rank").alias("mass"),
            )
            .collect()[0]
        )
        delta, dangling = float(row["delta"]), float(row["dangling"])
        ranks.unpersist()
        ranks = new_ranks
        stats.iterations = it + 1
        stats.deltas.append(delta)
        if checkpointer is not None and (it + 1) % checkpoint_every == 0:
            checkpointer.commit(
                iteration=it + 1,
                state=ranks.select("id", "rank"),
                rows=n,
                agg_value=float(row["mass"]),
                delta_max=delta,
            )
        if delta < tol:
            stats.converged = True
            break

    result = ranks.select("id", "rank")
    edges.unpersist()
    verts.unpersist()
    return result
