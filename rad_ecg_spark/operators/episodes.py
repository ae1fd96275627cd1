"""Grouped-map UDTF: per-group kernel emitting N rows per group.

This is the reference's single richest query shape — the per-section
beat extractor that takes one section of signal and emits one row per
detected beat (/root/reference/src/rad_ecg/scripts/porcine/
pig_extract.py:370-669, peak_detect_v4.py:1407-1567; SURVEY.md §2.10
calls it the canonical UDTF). Re-expressed Spark-first: the group is a
user's event history, the kernel detects "episodes" (maximal runs of
consecutive above-threshold events) and emits one row per episode.

Scale shape: ``groupBy(user_id).applyInPandas`` — one shuffle to
co-locate each group, then an Arrow-batched pandas kernel whose inner
loop is pure vectorized numpy (mask → run-break cumsum → groupby agg),
never per-row Python. Groups are users (bounded cardinality per key),
so no single task can be handed more than one user's history ... times
the number of users per partition; a pathological mega-user is bounded
by that user's row count, the same contract the reference's per-section
kernel has.

The kernel's arithmetic is exact-integer (cents) so the DuckDB oracle
(a gaps-and-islands SQL twin) reproduces every output bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPISODE_SCHEMA = (
    "user_id long, episode_id int, n_events long, "
    "start_ms long, end_ms long, sum_cents long, peak_cents long"
)


def detect_episodes(
    events: DataFrame,
    threshold: float = 250.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """One row per (user, episode): maximal run of consecutive events
    with value > threshold, in (ts, event_id) order."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_ms", "oid"], kind="mergesort")
        valid = pdf["cents"].to_numpy() > int(round(threshold * 100))
        if not valid.any():
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "episode_id": pd.Series([], dtype="int32"),
                    "n_events": pd.Series([], dtype="int64"),
                    "start_ms": pd.Series([], dtype="int64"),
                    "end_ms": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64"),
                    "peak_cents": pd.Series([], dtype="int64"),
                }
            )
        # vectorized gaps-and-islands: a run breaks where valid flips
        import numpy as np

        v = valid.astype(np.int64)
        breaks = np.concatenate([[v[0]], np.abs(np.diff(v))])
        run_id = np.cumsum(breaks)
        sub = pd.DataFrame(
            {
                "run": run_id[valid],
                "ts_ms": pdf["ts_ms"].to_numpy()[valid],
                "cents": pdf["cents"].to_numpy()[valid],
            }
        )
        g = sub.groupby("run", sort=True).agg(
            n_events=("cents", "size"),
            start_ms=("ts_ms", "min"),
            end_ms=("ts_ms", "max"),
            sum_cents=("cents", "sum"),
            peak_cents=("cents", "max"),
        )
        g = g.reset_index(drop=True)
        g.insert(0, "user_id", int(pdf["uid"].iloc[0]))
        g.insert(1, "episode_id", (g.index + 1).astype("int32"))
        return g.astype(
            {
                "n_events": "int64",
                "start_ms": "int64",
                "end_ms": "int64",
                "sum_cents": "int64",
                "peak_cents": "int64",
            }
        )

    prepared = events.select(
        F.col(user_col).alias("uid"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.col(order_col).alias("oid"),
    )
    return prepared.groupBy("uid").applyInPandas(kernel, schema=EPISODE_SCHEMA)


def episodes_oracle_sql(threshold: float = 250.0) -> str:
    """DuckDB twin: classic gaps-and-islands over the same cents ints."""
    thr_c = int(round(threshold * 100))
    return f"""
WITH e AS (
  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
         CAST(round(value * 100) AS BIGINT) AS cents, event_id
  FROM events
), flagged AS (
  SELECT *, CASE WHEN cents > {thr_c} THEN 1 ELSE 0 END AS valid,
    sum(CASE WHEN cents > {thr_c} THEN 0 ELSE 1 END)
      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS grp
  FROM e
), runs AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS n_events,
         CAST(min(ts_ms) AS BIGINT) AS start_ms,
         CAST(max(ts_ms) AS BIGINT) AS end_ms,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(max(cents) AS BIGINT) AS peak_cents
  FROM flagged WHERE valid = 1 GROUP BY user_id, grp
)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_ms, grp) AS INT) AS episode_id,
       n_events, start_ms, end_ms, sum_cents, peak_cents
FROM runs"""
