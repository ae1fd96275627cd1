"""Custom stateful streaming operator: per-key bounded state with an
event-time staleness timeout — ``applyInPandasWithState``.

Reference semantics being re-expressed: the engine re-vets a section
when its data goes stale for > 60 s of signal time
(/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:1738-1746) and
keeps a bounded per-key rolling state (deque maxlen=6,
peak_detect_v4.py:106-109). Spark-first shape: the stream is grouped by
key, each key holds a tiny fixed-size state tuple in the state store,
and the event-time watermark drives a timeout that emits a ``stale``
row and drops the state — exactly Structured Streaming's contract for
"key went quiet".

Scale: state is O(active keys) and partitioned by the groupBy key; the
kernel sees Arrow batches per key and does vectorized pandas ops only.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, status string, n_events long, sum_cents long, last_ms long, "
    "recent_n int, recent_mean_c long"
)
STATE_SCHEMA = "n long, s long, last_ms long, recent array<long>"

ROLLING_MAXLEN = 6  # reference's deque(maxlen=6) history bound


def staleness_monitor(
    stream: DataFrame,
    watermark: str = "1 minute",
    stale_after_ms: int = 60_000,
) -> DataFrame:
    """Per-user running (count, sum) + a BOUNDED rolling history with a
    stale-key emission.

    State = (count, sum, last_seen, last-6-values buffer) — the exact
    shape of the reference's bounded ``deque(maxlen=6)`` rolling history
    (peak_detect_v4.py:106-109): state per key is O(1), never O(events).
    Emits an ``active`` row per key per batch with running totals and
    the rolling-window integer mean; when the event-time watermark
    passes last_seen + stale_after_ms the key emits one ``stale`` row
    and its state is dropped (a later event restarts fresh — the
    reference's re-vet)."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        uid = key[0]

        def row(status, n, s, last_ms, recent):
            rn = len(recent)
            return pd.DataFrame(
                {
                    "user_id": [uid],
                    "status": [status],
                    "n_events": [n],
                    "sum_cents": [s],
                    "last_ms": [last_ms],
                    "recent_n": [rn],
                    "recent_mean_c": [sum(recent) // rn if rn else 0],
                }
            )

        if state.hasTimedOut:
            n, s, last_ms, recent = state.get
            state.remove()
            yield row("stale", n, s, last_ms, list(recent or []))
            return
        n, s, last_ms, recent = (
            state.get if state.exists else (0, 0, 0, [])
        )
        recent = list(recent or [])
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts_ms"], kind="mergesort")
            n += len(pdf)
            s += int(pdf["cents"].sum())
            last_ms = max(last_ms, int(pdf["ts_ms"].max()))
            recent = (recent + [int(c) for c in pdf["cents"]])[-ROLLING_MAXLEN:]
        state.update((n, s, last_ms, recent))
        # event-time timeout must be beyond the current watermark
        state.setTimeoutTimestamp(
            max(last_ms + stale_after_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield row("active", n, s, last_ms, recent)

    prepared = (
        stream.withWatermark("ts", watermark)
        .select(
            "ts",
            "user_id",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
