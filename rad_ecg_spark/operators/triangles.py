"""Triangle counting via degree-ordered edge joins.

Classic MapReduce formulation (Suri & Vassilvitskii, WWW'11 — public):
orient every undirected edge from its lower-(degree, id) endpoint to the
higher one. The orientation is a total order, so each triangle
{u < v < w} appears exactly once as the wedge u→v, v→w closed by u→w.
Degree-ordering is THE skew defense for power-law web graphs: a hub of
degree D generates wedges only among its *higher*-degree neighbors, so
wedge count is bounded by arboricity — sum(min(deg_u, deg_v)) instead of
sum(deg²) — which is what keeps a 10^8-degree supernode from emitting
10^16 wedge candidates.

Plan shape: two self-joins of the oriented edge list (wedge build +
closing semi-join), all equi-joins — sort-merge at scale, with the
degree table broadcast when small.

Output: global count plus optional per-vertex counts (each triangle
credits all three corners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from rad_ecg_spark.operators.graph_core import normalize_edges, symmetrize, vertices_of


def _oriented(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(oriented_edges, persisted_sym): undirected edges oriented
    low→high by (degree, id).

    ``sym`` feeds THREE consumers (degree table + both canon branches);
    persisting it makes the upstream edge derivation (often a distinct
    over a source table) run once instead of once per consumer. The
    caller unpersists the returned ``sym`` after materializing the
    orientation.
    """
    sym = symmetrize(normalize_edges(edges)).persist(StorageLevel.MEMORY_AND_DISK)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    canon = sym.filter(F.col("src") < F.col("dst"))
    e = (
        canon.join(deg.select(F.col("src").alias("u"), F.col("deg").alias("du")),
                   canon.src == F.col("u"))
        .join(deg.select(F.col("src").alias("v"), F.col("deg").alias("dv")),
              canon.dst == F.col("v"))
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst"))),
                F.struct(F.col("src").alias("a"), F.col("dst").alias("b")),
            )
            .otherwise(F.struct(F.col("dst").alias("a"), F.col("src").alias("b")))
            .alias("e")
        )
        .select(F.col("e.a").alias("src"), F.col("e.b").alias("dst"))
    )
    return e, sym


def triangles(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts: DataFrame(id, tri_count) covering ALL
    vertices (0 for triangle-free ones)."""
    verts = vertices_of(normalize_edges(edges))
    o, sym = _oriented(edges)
    o = o.persist(StorageLevel.MEMORY_AND_DISK)
    o.count()  # materialize through sym's cache, then release it
    sym.unpersist()
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = o.select(F.col("src").alias("v2"), F.col("dst").alias("w"))
    wedges = e1.join(e2, e1.v == e2.v2).select("u", "v", "w")
    closing = o.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["u", "w"], "inner")  # semi-close wedges
    corners = (
        tris.select(F.col("u").alias("id"))
        .unionByName(tris.select(F.col("v").alias("id")))
        .unionByName(tris.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    out = verts.join(corners, "id", "left").select(
        "id", F.coalesce(F.col("tri_count"), F.lit(0)).alias("tri_count")
    )
    o.unpersist()
    return out


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count (each triangle once)."""
    o, sym = _oriented(edges)
    o = o.persist(StorageLevel.MEMORY_AND_DISK)
    o.count()  # materialize through sym's cache, then release it
    sym.unpersist()
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = o.select(F.col("src").alias("v2"), F.col("dst").alias("w"))
    wedges = e1.join(e2, e1.v == e2.v2).select("u", "w")
    closing = o.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    n = wedges.join(closing, ["u", "w"], "left_semi").count()
    o.unpersist()
    return n
