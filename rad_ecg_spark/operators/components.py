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

``hybrid`` (the default for the registry query) combines them: run
hashmin for a capped number of rounds — enough for any web-shaped
(small-diameter) graph to finish — then, if not converged, CONTRACT the
graph by the partial labels (quotient edges (label(u), label(v)),
usually orders of magnitude smaller) and finish with star's O(log n)
rounds on the contraction. Correctness: hashmin labels are component-
consistent (label(v) is a vertex of v's component, and the component's
global-min vertex always keeps itself as label), so contraction
preserves connectivity and star's min-root over quotient nodes IS the
original min vertex id. This keeps hashmin's measured 2x win on the
common case without giving up the worst-case round bound on a
long-chain component.

Session lifetime note: results are projections over localCheckpoint
state whose blocks live until the DataFrame is garbage-collected, so a
long-lived driver LOOPING over many connected_components calls should
materialize (write/collect) each result and drop the reference before
the next call — measured block accumulation slows repeated in-JVM runs
(34 s -> 70 s over four back-to-back 10M-edge runs). One-shot jobs
(spark-submit, the registry queries) are unaffected.

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
    hashmin_rounds: int = 12,
) -> DataFrame:
    """DataFrame(id, component); component = min id in the component.

    ``method``: "star" (worst-case-safe O(log n) rounds), "hashmin"
    (O(diameter) rounds, fastest on web-shaped graphs), or "hybrid"
    (hashmin capped at ``hashmin_rounds``, then star on the label
    contraction if not yet converged — see module docstring)."""
    spark = edges.sparkSession
    # persist the normalized edges: verts, sym and (on the hybrid
    # fallback) the quotient all re-read them, and the input is often an
    # expensive derivation (a distinct over a source table) that would
    # otherwise be recomputed per consumer (measured ~1.5 s per re-read
    # at sf1.0).
    # repartition to the session parallelism BEFORE caching: the input
    # is typically a 1-2-split scan (single-row-group parquet), and a
    # cache that inherits that layout makes every downstream map side
    # (verts distinct, sym build) 1-2-way parallel. One narrow exchange
    # of (src, dst) pairs buys full-width map sides.
    n_session = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = (
        normalize_edges(edges)
        .repartition(n_session, "src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = edges.count()
    verts = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    if num_partitions is None:
        # size on the symmetric edge table (2|E|) — the rows every round
        # actually moves; vertex-count sizing left a 3M-row sym table on
        # 2 partitions at sf1.0 (1.2 s/round vs 0.45 s at 16).
        num_partitions = size_partitions(spark, n_edges * 2)

    with pinned_loop_conf(spark, num_partitions):
        result = _run(edges, verts, method, max_iter, num_partitions, hashmin_rounds)
    out = result.select("id", "component")
    verts.unpersist()
    edges.unpersist()
    return out


def _hashmin(edges, verts, max_rounds, num_partitions):
    """(labels DataFrame(id, component), converged). Labels are always
    component-consistent: label(v) = min id within some ball around v.

    Loop discipline mirrors labelprop (the measured 5.7x shape): sym
    partitioned by src ONCE and joined to labels on src==id — both
    hash-partitioned on the same key domain, so the join is
    exchange-free — then the (dst, component) message stream pays the
    round's ONE shuffle into the min aggregation, and the write-back
    join is co-partitioned again (labels by id, nbr_min by dst).
    Audited live by tools/audit_loops.py::hashmin_round_plan.

    Frontier (delta) propagation: each round sends messages only from
    vertices whose label CHANGED last round. Labels are monotonically
    decreasing and a vertex's min can only improve when a neighbor's
    label dropped, and every label value a vertex ever held was
    delivered to its neighbors in the round it changed (round 1 delivers
    from everyone) — so the per-round labels, the round count and the
    fixpoint are IDENTICAL to full hashmin, but the message stream (and
    the round's shuffle) shrinks with the frontier. On the sf1.0
    derived graph the last two rounds carry 70 and 0 changes instead of
    re-delivering all 3M edges."""
    labels = (
        verts.select(
            "id",
            F.col("id").alias("component"),
            F.lit(1).cast("long").alias("changed"),  # round-1 frontier: all
        )
        .repartition(num_partitions, "id")
        # lazy: round 1's frontier join materializes it
        .localCheckpoint(eager=False)
    )
    # both directions -> ONE exchange (repartition by src; the dedup
    # reuses HashPartitioning(src) via the subset rule) instead of
    # symmetrize()'s distinct-then-repartition double shuffle.
    sym = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .repartition(num_partitions, "src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    # lazy persist: round 1's message join materializes sym ONCE
    # (persist locking) through the caller's cached edges — a dedicated
    # count() here was a pure 2|E| barrier job (same fusion as
    # triangle_count; labels above is lazy for the same reason). sym
    # holds no upstream cache hostage: edges stays cached for the
    # hybrid quotient regardless, and sym.unpersist() after the loop is
    # unchanged.
    converged = False
    for _ in range(max_rounds):
        # min over neighbors of dst: sym is symmetric, so grouping the
        # src-side labels by dst sees every neighbor of every vertex.
        # Plain groupBy (no pre-repartition): the loop conf pins
        # shuffle.partitions = num_partitions, so the aggregate lands on
        # the state's partition count AND gets map-side partial
        # aggregation before the exchange (the explicit repartition
        # shuffled the raw 2|E| message rows).
        frontier = labels.filter(F.col("changed") == 1).select("id", "component")
        msgs = sym.join(
            frontier.hint("shuffle_hash"), sym.src == frontier.id
        ).select("dst", "component")
        nbr_min = msgs.groupBy("dst").agg(F.min("component").alias("nbr_min"))
        new_comp = F.least(
            F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
        )
        new_labels = (
            labels.join(nbr_min.hint("shuffle_hash"), labels.id == nbr_min.dst, "left")
            .select(
                "id",
                new_comp.alias("component"),
                # change detection inline (delta-as-a-column, see
                # pagerank.py) — no per-iteration self-join
                (new_comp != F.col("component")).cast("long").alias("changed"),
            )
            # lineage truncation per iteration (see pagerank.py doc);
            # lazy: the changed-count agg below materializes it (one job)
            .localCheckpoint(eager=False)
        )
        changed = int(
            new_labels.agg(F.coalesce(F.sum("changed"), F.lit(0))).collect()[0][0]
        )
        free_local_checkpoint(labels)
        # keep the checkpointed frame itself (not a projection) so the
        # next round's free_local_checkpoint can release its blocks
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    return labels, converged


def _star_components(edges, num_partitions, max_iter):
    """Star alternation on ``edges``; returns DataFrame(id, component)
    covering the vertices that appear in edges (isolated vertices are
    the caller's job)."""
    cur = (
        _sym_nodedup(edges)
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
            # lazy: the fingerprint agg below materializes it (one job)
            .localCheckpoint(eager=False)
        )
        fp = _fingerprint(cur)
        free_local_checkpoint(prev_ckpt)
        if fp == prev_fp:
            break
        prev_fp = fp
    # stable symmetric star graph: component(v) = min(N(v) ∪ {v})
    return _min_of_neighborhood(cur).select(
        F.col("src").alias("id"), F.col("m").alias("component")
    )


def _run(edges, verts, method, max_iter, num_partitions, hashmin_rounds=12):
    if method == "hashmin":
        result, _ = _hashmin(edges, verts, max_iter, num_partitions)
    elif method == "hybrid":
        labels, converged = _hashmin(edges, verts, hashmin_rounds, num_partitions)
        if converged:
            return labels
        # contract by partial labels: quotient edges between label groups.
        # |quotient| <= edges whose endpoints a hashmin ball never merged —
        # tiny after ~diameter rounds on everything but adversarial chains.
        ls = labels.select(F.col("id").alias("src"), F.col("component").alias("lsrc"))
        ld = labels.select(F.col("id").alias("dst"), F.col("component").alias("ldst"))
        quotient = (
            edges.join(ls.hint("shuffle_hash"), "src")
            .join(ld.hint("shuffle_hash"), "dst")
            .filter(F.col("lsrc") != F.col("ldst"))
            .select(F.col("lsrc").alias("src"), F.col("ldst").alias("dst"))
        )
        roots = _star_components(quotient, num_partitions, max_iter).select(
            F.col("id").alias("component"), F.col("component").alias("root")
        )
        # shuffle join, not broadcast: an adversarial (long-chain) graph
        # can leave a quotient as large as the label set
        result = labels.join(roots.hint("shuffle_hash"), "component", "left").select(
            "id",
            F.coalesce(F.col("root"), F.col("component")).alias("component"),
        )
    else:
        comp = _star_components(edges, num_partitions, max_iter)
        result = (
            verts.join(comp, "id", "left")
            .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
        )

    return result
