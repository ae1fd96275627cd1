"""Matrix-profile discord detection as a grouped-map kernel.

Reference capability: stumpy matrix-profile discord search per section
(/root/reference/src/rad_ecg/scripts/ml/anomaly/stump_anom.py:60-110,
porcine/stumpy_discord.py) — for every length-w window of a series, the
z-normalized distance to its nearest non-trivial neighbor; the window
whose nearest neighbor is FARTHEST is the discord (anomaly).

Spark-first shape: series are grouped by key (user), each group's
kernel is vectorized numpy inside ``applyInPandas`` — an (nw x nw)
pairwise z-distance computed as a LEFT-FOLD over the w lag terms so the
DuckDB oracle (explicit 8-term sum chain) reproduces every double
bit-for-bit. Window means/variances come from exact integer (cents)
sums. Exclusion zone |i-j| < w, zero-variance windows dropped on both
sides (identically in the oracle).

At 100 TB: groups are bounded per-key series (the reference's
per-section contract); for one giant series the same kernel runs per
chunk-with-halo via mapInPandas — the banding is the partition layout,
not the algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MP_SCHEMA = (
    "user_id long, discord_idx int, nn_idx int, mp_e6 long, n_windows int"
)


def matrix_profile_discord(
    events: DataFrame,
    w: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Per user: the discord window (1-based index), its nearest
    neighbor and z-distance^2 (x1e6), over length-``w`` windows of the
    cents series in (ts, order) order."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "discord_idx": pd.Series([], dtype="int32"),
                "nn_idx": pd.Series([], dtype="int32"),
                "mp_e6": pd.Series([], dtype="int64"),
                "n_windows": pd.Series([], dtype="int32"),
            }
        )
        pdf = pdf.sort_values(["ts_ms", "oid"], kind="mergesort")
        x = pdf["cents"].to_numpy(dtype=np.int64)
        n = len(x)
        nw = n - w + 1
        if nw < 2:
            return empty
        win = np.lib.stride_tricks.sliding_window_view(x, w)  # (nw, w) ints
        s1 = win.sum(axis=1, dtype=np.int64)
        s2 = (win * win).sum(axis=1, dtype=np.int64)
        wf = float(w)
        mu = s1 / wf
        var = (s2 - (s1 / wf) * s1) / wf  # mirrored verbatim in the oracle
        keep = var > 0
        idx = np.nonzero(keep)[0]
        if len(idx) < 2:
            return empty
        sig = np.sqrt(var[idx])
        z = (win[idx].astype(np.float64) - mu[idx][:, None]) / sig[:, None]
        # pairwise dist^2 as a LEFT FOLD over the w lag terms (never
        # np.sum's pairwise tree): identical op order to the SQL chain
        m = len(idx)
        acc = np.zeros((m, m))
        for k in range(w):
            d = z[:, k][:, None] - z[None, :, k]
            acc += d * d
        excl = np.abs(idx[:, None] - idx[None, :]) < w
        acc[excl] = np.inf
        valid_i = ~np.isinf(acc).all(axis=1)
        if not valid_i.any():
            return empty
        nn_pos = np.argmin(acc, axis=1)  # first min = smallest j
        mp = acc[np.arange(m), nn_pos]
        mp[~valid_i] = -np.inf
        best = int(np.argmax(mp))  # first max = smallest i
        return pd.DataFrame(
            {
                "user_id": [int(pdf["uid"].iloc[0])],
                "discord_idx": np.array([idx[best] + 1], dtype=np.int32),
                "nn_idx": np.array([idx[nn_pos[best]] + 1], dtype=np.int32),
                "mp_e6": np.array(
                    [int(np.floor(mp[best] * 1e6 + 0.5))], dtype=np.int64
                ),
                "n_windows": np.array([m], dtype=np.int32),
            }
        )

    prepared = events.select(
        F.col(user_col).alias("uid"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.col(order_col).alias("oid"),
    )
    return prepared.groupBy("uid").applyInPandas(kernel, schema=MP_SCHEMA)


def matrix_profile_oracle_sql(w: int = 8) -> str:
    """DuckDB twin. Window stats from exact integer sums; the z-distance
    is the same explicit left-assoc 8-term chain as the kernel's fold."""
    terms = " + ".join(
        f"((a.arr[{k}] - a.mu) / a.sig - (b.arr[{k}] - b.mu) / b.sig) * "
        f"((a.arr[{k}] - a.mu) / a.sig - (b.arr[{k}] - b.mu) / b.sig)"
        for k in range(1, w + 1)
    )
    return f"""
WITH o AS (
  SELECT user_id, CAST(round(value*100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), win AS (
  SELECT user_id, rn AS i,
         list(cents) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS arr,
         CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS BIGINT) AS s1,
         CAST(sum(cents*cents) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS BIGINT) AS s2,
         n
  FROM o
), stats AS (
  SELECT user_id, CAST(i AS BIGINT) AS i, arr,
         s1 / {w}.0 AS mu,
         sqrt((s2 - (s1 / {w}.0) * s1) / {w}.0) AS sig,
         (s2 - (s1 / {w}.0) * s1) / {w}.0 AS var
  FROM win WHERE i <= n - {w} + 1
), zwin AS (
  SELECT * FROM stats WHERE var > 0
), pair AS (
  SELECT a.user_id, a.i AS i, b.i AS j, ({terms}) AS d2
  FROM zwin a JOIN zwin b
    ON a.user_id = b.user_id AND abs(a.i - b.i) >= {w}
), mp AS (
  SELECT user_id, i, j AS nn, d2 AS mpv FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, i ORDER BY d2, j) AS rk
    FROM pair
  ) WHERE rk = 1
), cnt AS (
  SELECT user_id, CAST(count(*) AS INT) AS n_windows FROM zwin GROUP BY user_id
), discord AS (
  SELECT user_id, i, nn, mpv,
         row_number() OVER (PARTITION BY user_id ORDER BY mpv DESC, i ASC) AS rk
  FROM mp
)
SELECT d.user_id, CAST(i AS INT) AS discord_idx, CAST(nn AS INT) AS nn_idx,
       CAST(floor(mpv * 1e6 + 0.5) AS BIGINT) AS mp_e6, c.n_windows
FROM discord d JOIN cnt c USING (user_id)
WHERE rk = 1"""
