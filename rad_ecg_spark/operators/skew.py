"""Skew mitigation for supernode joins (north_rule: "salted joins and
broadcast handling for high-degree supernodes").

Two structural tools:

- ``salted_join(big, small, key, n_salts)``: generic salted equi-join.
  The big side gets a per-row salt (hash of a disambiguating column mod
  n_salts), the small side is replicated n_salts times, and the join key
  becomes (key, salt) — a single hot key fans out over n_salts tasks
  instead of one straggler. Use when the small side is too big to
  broadcast but the big side has hot keys.

- ``split_hub_edges(edges, threshold)``: degree-based hub/residual split
  for iterative message passing. Edges whose src out-degree >= threshold
  go to a ``hub`` table kept in its natural (balanced) partitioning and
  joined per-iteration against a BROADCAST slice of the rank state
  (the slice has at most |hubs| rows — tiny by definition of a hub
  threshold); residual edges keep the co-partitioned shuffle-hash path,
  where the per-src row count is bounded by the threshold, so no task
  can be handed more than threshold rows for one key.

Reference capability donor: the work-queue rebalancing idea
(/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:1664-1679) —
oversized work units are routed to a different execution path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    unique_col: str | None = None,
) -> DataFrame:
    """Equi-join big⋈small on ``key`` with the hot-key fan-out spread
    over ``n_salts`` subtasks. Output rows equal ``big.join(small, key,
    how)`` for how in {inner, left} ONLY (the small side is replicated
    n_salts times, so right/full-outer would emit unmatched small rows
    n_salts times — asserted away).

    Salt derivation is DETERMINISTIC — this matters under stage retries:
    Spark only guards round-robin repartition against indeterminate-stage
    recomputation, so a nondeterministic salt (row id / rand) feeding a
    shuffle-join key can duplicate or drop rows if a map stage is
    recomputed after some reducers committed. Two modes:

    - ``unique_col`` given: salt = xxhash64(that column) — per-row
      spread even when the hot key's other columns are duplicated.
      Use a primary key / event id.
    - default: salt = xxhash64(all big-side columns). Fully duplicate
      rows of a hot key then share a salt bucket (bounded residual skew
      proportional to the duplicate multiplicity, documented tradeoff);
      distinct rows spread uniformly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    salt_src = (
        [F.col(unique_col)] if unique_col is not None else [F.col(c) for c in big.columns]
    )
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    small_s = small.select("*", salts)
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def split_hub_edges(
    edges: DataFrame, threshold: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(residual_edges, hub_edges, hub_ids): split by src out-degree.

    hub_ids is small by construction (sum of degrees is |E|, so at most
    |E|/threshold hubs exist) — safe to broadcast.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    hubs = deg.filter(F.col("outdeg") >= threshold).select("src")
    hub_edges = edges.join(F.broadcast(hubs), "src", "left_semi")
    residual = edges.join(F.broadcast(hubs), "src", "left_anti")
    return residual, hub_edges, hubs.select(F.col("src").alias("id"))
