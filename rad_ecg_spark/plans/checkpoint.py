"""Per-iteration checkpoint / lineage / resume for iterative graph jobs.

Iceberg-snapshot semantics on plain partitioned parquet (no Iceberg jars
in this sandbox — the layout maps 1:1 onto ``df.writeTo(tbl).append()``
plus a snapshot-metadata table when a catalog is available):

    <root>/<algo>/state/iteration=<k>/   parquet state for iteration k
    <root>/<algo>/_meta/                 append-only lineage table

``_meta`` schema (FIXTURES.md F4):
    algo, iteration, rows, agg_value (e.g. sum of ranks), delta_max,
    wall_ms, status

Commit protocol (crash-safe without atomic renames):
  1. write state parquet for iteration k (directory write is idempotent —
     a re-run overwrites the same path);
  2. only then append the _meta row with status='complete'.
A killed job leaves either no directory or an un-acknowledged directory;
resume reads max(iteration) WHERE status='complete' and overwrites any
torn k+1 directory. This mirrors the reference's skip-if-done + cache
reload (/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:1850-1853,
porcine/stumpy_fluss_phase_angle.py:688-721).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("algo", T.StringType()),
        T.StructField("iteration", T.IntegerType()),
        T.StructField("rows", T.LongType()),
        T.StructField("agg_value", T.DoubleType()),
        T.StructField("delta_max", T.DoubleType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


class CheckpointManager:
    """Snapshot state per iteration; resume from the last complete one.

    ``async_write=True`` overlaps the durable snapshot with the NEXT
    iteration's compute: commit() submits the (state parquet -> meta
    append) sequence to a single worker thread and returns immediately.
    Correctness invariants preserved:
      - the meta 'complete' row is still appended only AFTER the state
        write, inside the same worker task (crash -> torn dir without an
        acknowledging meta row, exactly as in sync mode);
      - at most ONE commit is in flight (commit() waits for the previous
        one first), so meta rows land in iteration order;
      - callers that free superseded state blocks (localCheckpoint) must
        call wait() first — the iterative loops in operators/ do.
    Measured at 10M edges to 1e-6 convergence (BENCH/BASELINE.md
    round-4): the round-3 protocol (meta row via a coalesce(1) Spark
    job) cost 3.9x the plain wall; replacing that one-row job with the
    driver-side pyarrow append (_append_meta_row) brings SYNC
    per-iteration checkpointing to 1.15x plain, async to 1.07x and
    checkpoint_every=5 to 1.10x — i.e. durable per-iteration lineage is
    now within noise of free at bench scale.
    """

    def __init__(
        self, spark: SparkSession, root: str, algo: str, async_write: bool = False
    ):
        self.spark = spark
        self.root = root
        self.algo = algo
        self._t0 = time.monotonic()
        self._async = async_write
        # async worker: ONE daemon thread per in-flight commit (never
        # more than one — commit() drains the previous first). Daemon,
        # so a loop that raises before wait() can't leave a non-daemon
        # writer pinning interpreter exit; a commit cut off at exit
        # leaves a torn state dir without its acknowledging _meta row,
        # which the crash-safe resume protocol already treats as
        # not-committed (module docstring).
        self._pending: tuple | None = None  # (thread, [exception])

    def _state_dir(self, iteration: int) -> str:
        return os.path.join(self.root, self.algo, "state", f"iteration={iteration}")

    def _meta_dir(self) -> str:
        return os.path.join(self.root, self.algo, "_meta")

    def commit(
        self,
        iteration: int,
        state: DataFrame,
        rows: int,
        agg_value: float,
        delta_max: float,
    ) -> None:
        wall_ms = int((time.monotonic() - self._t0) * 1000)
        self._t0 = time.monotonic()
        if not self._async:
            self._commit_sync(iteration, state, rows, agg_value, delta_max, wall_ms)
        else:
            import threading

            self.wait()  # <=1 in flight; propagate a failed prior commit
            errs: list[BaseException] = []

            def _run() -> None:
                try:
                    self._commit_sync(
                        iteration, state, rows, agg_value, delta_max, wall_ms
                    )
                except BaseException as e:  # surfaced by the next wait()
                    errs.append(e)

            t = threading.Thread(
                target=_run, name=f"ckpt-{self.algo}-{iteration}", daemon=True
            )
            t.start()
            self._pending = (t, errs)

    def wait(self) -> None:
        """Block until the in-flight async commit (if any) has landed.
        MUST be called before freeing the committed state's blocks and
        before reading _meta for convergence bookkeeping. Re-raises a
        failed background commit."""
        if self._pending is not None:
            (thread, errs), self._pending = self._pending, None
            thread.join()
            if errs:
                raise errs[0]

    def close(self) -> None:
        """Drain the in-flight commit (if any). Safe to call twice;
        use as a context manager for exception-path cleanup."""
        self.wait()

    def __enter__(self) -> "CheckpointManager":
        return self

    def __exit__(self, *exc) -> None:
        # don't mask an in-flight exception with a commit failure
        try:
            self.close()
        except Exception:
            if exc == (None, None, None):
                raise

    def _commit_sync(
        self,
        iteration: int,
        state: DataFrame,
        rows: int,
        agg_value: float,
        delta_max: float,
        wall_ms: int,
    ) -> None:
        state.write.mode("overwrite").parquet(self._state_dir(iteration))
        self._append_meta_row(iteration, rows, agg_value, delta_max, wall_ms)

    def _append_meta_row(
        self, iteration: int, rows: int, agg_value: float, delta_max: float, wall_ms: int
    ) -> None:
        """Append ONE lineage row. Driver-side pyarrow write, not a Spark
        job: ``meta.coalesce(1).write`` costs a full job (~2-3 s of pure
        scheduling per iteration — measured, BENCH/BASELINE.md round-4)
        to move one row; an Iceberg catalog commit is likewise a
        driver/catalog-side metadata operation (plans/catalog.py maps
        this call to the snapshot-commit API). Arrow types mirror
        META_SCHEMA exactly so spark.read.parquet sees one schema across
        engine- and driver-written files. Object-store roots (gs://,
        s3://) resolve through pyarrow's FileSystem.from_uri, the same
        driver-side path an Iceberg catalog commit takes; local paths
        use the local FS."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "algo": pa.array([self.algo], pa.string()),
                "iteration": pa.array([iteration], pa.int32()),
                "rows": pa.array([rows], pa.int64()),
                "agg_value": pa.array([float(agg_value)], pa.float64()),
                "delta_max": pa.array([float(delta_max)], pa.float64()),
                "wall_ms": pa.array([wall_ms], pa.int64()),
                "status": pa.array(["complete"], pa.string()),
            }
        )
        # unique filename: concurrent algos/retries never clobber a row
        fname = f"meta-{iteration:06d}-{uuid.uuid4().hex}.parquet"
        meta_dir = self._meta_dir()
        if "://" in meta_dir:
            from pyarrow import fs as pafs

            filesystem, base = pafs.FileSystem.from_uri(meta_dir)
            filesystem.create_dir(base, recursive=True)
            pq.write_table(table, f"{base}/{fname}", filesystem=filesystem)
        else:
            os.makedirs(meta_dir, exist_ok=True)
            pq.write_table(table, os.path.join(meta_dir, fname))

    def last_complete(self) -> int | None:
        """Max complete iteration, or None if no checkpoint exists.

        Only "no checkpoint yet" is swallowed; a corrupt/unreadable _meta
        must PROPAGATE — treating it as 'no checkpoint' would silently
        restart from iteration 0 and overwrite good snapshots."""
        self.wait()
        if not os.path.isdir(self._meta_dir()):
            return None
        from pyspark.errors import AnalysisException

        try:
            meta = self.spark.read.parquet(self._meta_dir())
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
                return None  # dir exists but holds no data yet
            raise
        row = (
            meta.filter(F.col("status") == "complete")
            .agg(F.max("iteration").alias("it"))
            .collect()[0]
        )
        return None if row["it"] is None else int(row["it"])

    def load_state(self, iteration: int) -> DataFrame:
        return self.spark.read.parquet(self._state_dir(iteration))

    def meta(self) -> DataFrame:
        self.wait()
        return self.spark.read.parquet(self._meta_dir())
