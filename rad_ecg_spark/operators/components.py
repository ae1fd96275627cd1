"""Connected components: large-star / small-star alternation.

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14 — public): operate on the symmetric edge list; per
round rewrite edges so every vertex points toward the minimum vertex of
its neighborhood; alternate

    large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
    small-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v < u,
                   plus (u, m)                       [dedup, drop loops]

until the edge set is stable; components are then stars centered on the
component-minimum vertex. Converges in O(log n) rounds — better than
hash-min's O(diameter) on high-diameter graphs, and every round is only
groupBy(min) + join, i.e. one shuffle each.

A simpler ``hashmin`` method is kept both for cross-checking (exact
same output) and as the measured fast path on LOW-diameter graphs:
O(diameter) rounds, each one join+min-agg — at 10M edges / 1M vertices
(diameter ~7) hashmin converges in 112 s vs star's 216 s on local[32].
Star remains the default because its O(log n) round bound is the
worst-case-safe choice at 10^12 scale, where a single long-chain
component would make hashmin take O(chain length) rounds.

Convergence detection without materializing edge-set diffs: the pair
(edge_count, sum(xxhash64(src,dst))) is a fingerprint; two identical
fingerprints in a row ⇒ stable. Cheap (one agg) and collision-safe in
practice (64-bit sum over distinct sets).

Output: DataFrame(id, component) where component = min vertex id of the
component — exact, deterministic, parallelism-independent.
"""

from __future__ import annotations

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


def _min_of_neighborhood(sym: DataFrame) -> DataFrame:
    """(src → m) where m = min(N(src) ∪ {src})."""
    return sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )


def _sym_nodedup(e: DataFrame) -> DataFrame:
    """Both directions WITHOUT distinct: duplicate rows don't change any
    min-aggregation inside a star round, and skipping two intermediate
    distincts per round (each a full shuffle) measured ~2x faster. The
    round's single dedup happens at the end, co-located with the src
    partitioning (subset rule: HashPartitioning(src) satisfies the
    (src,dst) grouping)."""
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))


def _large_star(sym: DataFrame) -> DataFrame:
    mins = _min_of_neighborhood(sym)
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins.hint("shuffle_hash"), "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(sym: DataFrame) -> DataFrame:
    mins = _min_of_neighborhood(sym)
    smaller = (
        sym.filter(F.col("dst") < F.col("src"))
        .join(mins.hint("shuffle_hash"), "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return smaller.unionByName(self_edge).filter(F.col("src") != F.col("dst"))


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("cnt"),
        # decimal(38,0) sum: immune to ANSI long-overflow on hash sums
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("chk"),
    ).collect()[0]
    return int(row["cnt"]), int(row["chk"])


def connected_components(
    edges: DataFrame,
    method: str = "star",
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame(id, component); component = min id in the component."""
    spark = edges.sparkSession
    edges = normalize_edges(edges)
    verts = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    if num_partitions is None:
        num_partitions = size_partitions(spark, verts.count() * 4)

    with pinned_loop_conf(spark):
        result = _run(edges, verts, method, max_iter, num_partitions)
    out = result.select("id", "component")
    verts.unpersist()
    return out


def _run(edges, verts, method, max_iter, num_partitions):
    if method == "hashmin":
        labels = verts.select("id", F.col("id").alias("component"))
        sym = symmetrize(edges).repartition(num_partitions, "src").persist()
        labels = labels.persist()
        for it in range(max_iter):
            nbr_min = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_min"))
            )
            new_comp = F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            )
            new_labels = (
                labels.join(nbr_min, labels.id == nbr_min.src, "left")
                .select(
                    "id",
                    new_comp.alias("component"),
                    # change detection inline (delta-as-a-column, see
                    # pagerank.py) — no per-iteration self-join
                    (new_comp != F.col("component")).cast("long").alias("changed"),
                )
                # lineage truncation per iteration (see pagerank.py doc)
                .localCheckpoint(eager=True)
            )
            changed = int(
                new_labels.agg(F.coalesce(F.sum("changed"), F.lit(0))).collect()[0][0]
            )
            labels.unpersist()
            free_local_checkpoint(labels)
            # keep the checkpointed frame itself (not a projection) so the
            # next round's free_local_checkpoint can release its blocks
            labels = new_labels
            if changed == 0:
                break
        sym.unpersist()
        result = labels
    else:
        cur = (
            symmetrize(edges)
            .repartition(num_partitions, "src")
            .dropDuplicates(["src", "dst"])  # no extra shuffle (subset rule)
        )
        cur = cur_ckpt = cur.localCheckpoint(eager=True)
        prev_ckpt = None
        prev_fp = None
        for _ in range(max_iter):
            cur = _large_star(cur)
            cur = _sym_nodedup(cur)  # star ops consume the symmetric view
            cur = _small_star(cur)
            prev_ckpt = cur_ckpt
            cur = cur_ckpt = (
                _sym_nodedup(cur)
                .repartition(num_partitions, "src")
                .dropDuplicates(["src", "dst"])  # ONE dedup per round
                .localCheckpoint(eager=True)
            )
            fp = _fingerprint(cur)
            free_local_checkpoint(prev_ckpt)
            if fp == prev_fp:
                break
            prev_fp = fp
        # stable symmetric star graph: component(v) = min(N(v) ∪ {v})
        comp = _min_of_neighborhood(cur).select(
            F.col("src").alias("id"), F.col("m").alias("component")
        )
        result = (
            verts.join(comp, "id", "left")
            .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
        )

    return result
