"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. JVM-side only —
  zip_with + aggregate for the dot product, no Python in the loop.
- banded multi-table hyperplane LSH (the scale path): b independent
  tables of r hyperplane sign-bits each; candidates are pairs sharing
  ANY table's bucket (same banding scheme as the MinHash LSH in
  operators/dedup.py). With r bits per table the expected bucket size is
  n / 2^r PER TABLE, so the self-join never degenerates toward a cross
  product the way a single wide bucket would; ``max_bucket`` drops
  pathological mega-buckets (documented recall tradeoff, the standard
  production mitigation). Hyperplanes are deterministic (seeded) so
  results are reproducible at any parallelism — and are embedded as
  literals so a DuckDB oracle reproduces buckets and scores exactly.
- IVF (inverted-file) ANN: coarse k-means quantization via spark.ml
  KMeans (fixed seed), vectors assigned to their nearest centroid cell;
  each query probes only the ``nprobe`` nearest cells. The centroid set
  is tiny and broadcast; the candidate join is an equi-join on cell id.

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


def _dim_of(vectors: DataFrame, vec_col: str, dim: int | None) -> int:
    """Explicit dim wins; otherwise read one row with a clear error on
    an empty table (never silently assume)."""
    if dim is not None:
        return dim
    row = vectors.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer embedding dim: '{vec_col}' has no non-null rows; "
            "pass dim= explicitly"
        )
    return len(row[0])


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


def hyperplanes(dim: int, n_tables: int, bits: int, seed: int = 42) -> list[list[list[float]]]:
    """planes[t][i] = the i-th hyperplane of table t (deterministic)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits, dim)).tolist()


def band_buckets(vec_col, planes: list[list[list[float]]]):
    """Array of (table_id, bucket) structs: bucket bit i of table t is
    sign(v · p_ti). All JVM expressions (zip_with/aggregate folds)."""
    out = []
    for t, table in enumerate(planes):
        bucket = None
        for i, p in enumerate(table):
            dot = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
            bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        out.append(
            F.struct(F.lit(t).alias("tid"), bucket.cast("long").alias("bucket"))
        )
    return F.array(*out)


def _bucketed(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    planes,
    max_bucket: int | None,
) -> DataFrame:
    """(id, vec, tid, bucket) rows, one per LSH table, with mega-buckets
    (> max_bucket members) dropped — bounds every join task."""
    b = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(band_buckets(F.col(vec_col), planes)).alias("tb"),
    ).select("id", "vec", F.col("tb.tid").alias("tid"), F.col("tb.bucket").alias("bucket"))
    if max_bucket is not None:
        sizes = b.groupBy("tid", "bucket").agg(F.count(F.lit(1)).alias("bsz"))
        b = b.join(
            F.broadcast(sizes.filter(F.col("bsz") > max_bucket)),
            ["tid", "bucket"],
            "left_anti",
        )
    return b


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing ANY of
    the query's ``n_tables`` band buckets (2^bits buckets per table).
    The candidate join is an equi-join on (table, bucket) — expected
    candidates per query ≈ n_tables * n / 2^bits, never O(n)."""
    dim = _dim_of(vectors, vec_col, dim)
    planes = hyperplanes(dim, n_tables, bits, seed)
    v = _bucketed(vectors, id_col, vec_col, planes, max_bucket)
    q = _bucketed(queries, id_col, vec_col, planes, max_bucket=None).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec"), "tid", "bucket"
    )
    cand = (
        v.join(F.broadcast(q), ["tid", "bucket"])
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "qvec", F.col("id").alias("vid"), F.col("vec").alias("vvec"))
        .dropDuplicates(["qid", "vid"])
    )
    scored = cand.select(
        "qid", "vid", cosine(F.col("qvec"), F.col("vvec")).alias("cos")
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
    n_tables: int = 4,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket: int | None = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH self-join.
    Each table's bucket join is bounded (expected n/2^bits per bucket,
    hard-capped by max_bucket), so the self-join cost is
    ~ n_tables * sum(bucket_size^2) — never the n^2 cross product."""
    dim = _dim_of(vectors, vec_col, dim)
    planes = hyperplanes(dim, n_tables, bits, seed)
    v = _bucketed(vectors, id_col, vec_col, planes, max_bucket)
    l = v.select(F.col("id").alias("a"), F.col("vec").alias("va"), "tid", "bucket")
    r = v.select(F.col("id").alias("b"), F.col("vec").alias("vb"), "tid", "bucket")
    return (
        l.join(r, ["tid", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb")
        .dropDuplicates(["a", "b"])
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _cell_structs(vec_col, centroids: list[list[float]]):
    """[(d2 to centroid ci, ci), ...] as JVM struct expressions; d2 is a
    left-assoc zip_with/aggregate fold (the oracle mirrors the order)."""
    out = []
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(
                vec_col, carr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out.append(F.struct(d2.alias("d2"), F.lit(ci).alias("cell")))
    return out


def _cosine_topk_tail(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "vid", "cos")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    fit_fraction: float = 1.0,
) -> DataFrame:
    """IVF (inverted-file) ANN: spark.ml KMeans coarse quantizer (fixed
    seed), vectors live in their nearest-centroid cell, queries probe the
    ``nprobe`` nearest cells only. The scan per query is an equi-join on
    cell id against ~nprobe/n_cells of the corpus.

    At 100 TB: the KMeans fit runs on a seeded SAMPLE (``fit_fraction``
    — centroid quality needs thousands of points per cell, not the whole
    corpus), ``transform`` is a map-side pass (centroids broadcast by
    spark.ml), and the candidate join shuffles by cell id — no all-pairs
    stage anywhere. Quality gate: recall pytest
    (tests/test_dedup_similarity.py). For a fully deterministic,
    SQL-checkable variant see ``ivf_fixed_topk``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vvec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    fit_df = v.select("features")
    if fit_fraction < 1.0:
        fit_df = fit_df.sample(fraction=fit_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(fit_df)
    assigned = model.transform(v).select(
        "vid", "vvec", F.col("prediction").alias("cell")
    )
    # rank each query's distance to every centroid; keep nprobe cells.
    # centroids are tiny (n_cells × dim) → literal arrays, JVM expressions.
    cents = [c.tolist() for c in model.clusterCenters()]
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probe = (
        q.select(
            "qid", "qvec",
            F.explode(
                F.slice(F.array_sort(F.array(*_cell_structs(F.col("qvec"), cents))), 1, nprobe)
            ).alias("pc"),
        )
        .select("qid", "qvec", F.col("pc.cell").alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(probe), "cell")
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", cosine(F.col("qvec"), F.col("vvec")).alias("cos"))
    )
    return _cosine_topk_tail(scored, k)


def ivf_centroids(dim: int, n_cells: int, seed: int = 11) -> list[list[float]]:
    """Deterministic (seeded) centroid set for ivf_fixed_topk — random
    Voronoi cells. Coarser than a fitted quantizer but reproducible as
    double literals in any engine (same trick as ``hyperplanes``)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_cells, dim)).tolist()


def ivf_fixed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with FIXED centroids passed as literals: cell assignment
    (argmin d2, ties to the smaller cell id) and the nprobe probe both
    become pure JVM expressions, so the whole operator is
    SQL-expressible and carries a full DuckDB oracle — the correctness
    twin of ``ivf_topk`` (which fits its quantizer). Same scale shape:
    map-side assignment, broadcast probe, equi-join on cell id."""
    # coalesce(-1): the assignment expression is nullable (GetArrayItem),
    # so the equi-join would inject IsNotNull(cell) and the optimizer
    # pushes that filter BELOW the exchange — duplicating the whole
    # n_cells x dim d2 computation onto the (serial, single-row-group)
    # scan side (guide §4.4's duplicated-expensive-expression problem,
    # via join null-rejection). A non-nullable key generates no filter;
    # a null embedding maps to cell -1, which matches no probe — the
    # same rows are dropped either way.
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vvec")
    ).withColumn(
        "cell",
        F.coalesce(
            F.array_sort(F.array(*_cell_structs(F.col("vvec"), centroids)))[0]["cell"],
            F.lit(-1),
        ),
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probe = (
        q.select(
            "qid", "qvec",
            F.explode(
                F.slice(
                    F.array_sort(F.array(*_cell_structs(F.col("qvec"), centroids))),
                    1, nprobe,
                )
            ).alias("pc"),
        )
        .select("qid", "qvec", F.col("pc.cell").alias("cell"))
    )
    scored = (
        v.join(F.broadcast(probe), "cell")
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", cosine(F.col("qvec"), F.col("vvec")).alias("cos"))
    )
    return _cosine_topk_tail(scored, k)
