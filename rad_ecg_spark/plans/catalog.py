"""Catalog plug: one sink interface, two backends.

The north rule names Iceberg tables; this sandbox ships no catalog jars
(and no network to fetch them), so the engine runs on a documented
parquet+``_meta`` stand-in (plans/checkpoint.py). This module is the
seam that makes the swap a configuration change rather than a rewrite:

- ``ParquetSink`` — the stand-in, fully functional here. Delegates to
  the same code paths the engine already uses (CheckpointManager,
  write_partitioned_table, merge_upsert).
- ``IcebergSink`` — the real catalog calls, expressed with public
  Spark APIs only (DataFrameWriterV2 ``writeTo`` and ANSI
  ``MERGE INTO``). Construction probes the session for a configured
  Iceberg catalog (``spark.sql.catalog.<name>`` conf) and raises a
  clear RuntimeError when absent, so nothing in this repo silently
  pretends a catalog exists. The SQL/API text it would issue is
  exposed as pure functions (``merge_sql``, ``create_state_table_sql``)
  so tests can pin the exact statements without a catalog.

Surface mapping (each stand-in call -> Iceberg equivalent):

| engine call (stand-in)                         | Iceberg call |
|---|---|
| CheckpointManager.commit: state parquet write  | ``df.writeTo(f"{cat}.{ns}.{algo}_state").append()`` into a table ``PARTITIONED BY (iteration)`` |
| CheckpointManager.commit: ``_meta`` append     | ``meta.writeTo(f"{cat}.{ns}.{algo}_meta").append()`` (or rely on Iceberg's own snapshot log + summary props) |
| CheckpointManager.last_complete                | ``SELECT max(iteration) FROM ..._meta WHERE status='complete'`` — or Iceberg metadata table ``..._state.snapshots`` |
| CheckpointManager.load_state(k)                | ``SELECT * FROM ..._state WHERE iteration = k`` (partition-pruned) or time-travel ``VERSION AS OF <snapshot>`` |
| sinks.write_partitioned_table (dynamic ovw)    | ``df.writeTo(tbl).overwritePartitions()`` |
| upsert.merge_upsert (max_by keep-one + swap)   | pre-dedup batch with the same max_by, then ``MERGE INTO`` (merge_sql below); the atomic dir swap becomes Iceberg's snapshot commit |
| free: torn-write protection via dir protocol   | free: Iceberg ACID snapshot isolation |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of Iceberg catalogs configured on this session (the
    public config contract: spark.sql.catalog.<name> = <impl class>).

    Probes BOTH config surfaces: the SparkContext conf (builder.config
    at context creation) and the session RuntimeConfig via ``SET``
    (spark.conf.set on a live session, or builder.config when the
    SparkContext was reused and only the session picked the entry up).
    Missing the latter would refuse IcebergSink on a correctly
    configured session."""
    confs: dict[str, str] = {}
    try:
        confs.update(dict(spark.sparkContext.getConf().getAll()))
    except Exception:
        pass
    try:
        confs.update(
            (r["key"], r["value"]) for r in spark.sql("SET").collect()
        )
    except Exception:
        pass
    names = []
    for k, v in confs.items():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in str(v).lower():
                names.append(k.rsplit(".", 1)[-1])
    return sorted(set(names))


def create_state_table_sql(table: str, state_df: DataFrame) -> str:
    """CREATE TABLE for an iteration-partitioned Iceberg state table.

    Partitioning by iteration makes load_state(k) a partition-pruned
    scan and lets ``overwritePartitions`` re-run a torn iteration
    idempotently — the same layout contract as the parquet stand-in's
    ``state/iteration=<k>/`` directories."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in state_df.schema)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} "
        f"({cols}, iteration int) USING iceberg PARTITIONED BY (iteration)"
    )


def merge_sql(table: str, cols: list[str], key_cols: list[str], ts_col: str) -> str:
    """The MERGE INTO equivalent of upsert.merge_upsert's keep-one rule:
    latest event-time wins; updates beat existing only on event-time
    ties (s.ts >= t.ts). The updates batch must be pre-deduped per key
    (dedupe_batch) — MERGE requires a unique source row per target row."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols)
    vals = ", ".join(f"s.{c}" for c in cols)
    collist = ", ".join(cols)
    return (
        f"MERGE INTO {table} t USING __updates s ON {on} "
        f"WHEN MATCHED AND s.{ts_col} >= t.{ts_col} THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
    )


def dedupe_batch(updates: DataFrame, key_cols: list[str], ts_col: str) -> DataFrame:
    """Collapse an updates batch to one row per key (latest ts wins,
    deterministic struct tie-break) — same skew-safe max_by shape as
    merge_upsert, reused verbatim for the MERGE source."""
    cols = updates.columns
    payload = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col(ts_col).alias("_ts"), payload.alias("_row"))
    return (
        updates.groupBy(*key_cols)
        .agg(F.max_by(payload, order).alias("_w"))
        .select(*[F.col(f"_w.{c}").alias(c) for c in cols])
    )


class ParquetSink:
    """The sandbox backend: same semantics, parquet + directory protocol."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def checkpoint_manager(self, algo: str):
        from rad_ecg_spark.plans.checkpoint import CheckpointManager

        return CheckpointManager(self.spark, self.root, algo)

    def overwrite_partitions(self, df: DataFrame, name: str, partition_cols: list[str]) -> None:
        from rad_ecg_spark.sources.sinks import write_partitioned_table

        write_partitioned_table(df, f"{self.root}/{name}", partition_cols)

    def merge(self, updates: DataFrame, name: str, key_cols: list[str], ts_col: str) -> None:
        from rad_ecg_spark.plans.upsert import merge_upsert

        merge_upsert(self.spark, f"{self.root}/{name}", updates, key_cols, ts_col)


class IcebergSink:
    """The catalog backend. Every method body is the real public-API
    call; the constructor refuses to run without a configured catalog
    so this cannot silently no-op in the sandbox."""

    def __init__(self, spark: SparkSession, catalog: str | None = None, namespace: str = "rad_ecg"):
        cats = iceberg_catalogs(spark)
        if catalog is None:
            catalog = cats[0] if cats else None
        if catalog is None or catalog not in cats:
            raise RuntimeError(
                "No Iceberg catalog configured on this SparkSession. "
                "Configure one (spark.sql.catalog.<name>=org.apache.iceberg."
                "spark.SparkCatalog + iceberg-spark-runtime on the classpath) "
                f"or use ParquetSink. Found catalogs: {cats or 'none'}"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _tbl(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def append_state(self, state: DataFrame, algo: str, iteration: int) -> None:
        tbl = self._tbl(f"{algo}_state")
        df = state.withColumn("iteration", F.lit(iteration))
        self.spark.sql(create_state_table_sql(tbl, state))
        # overwritePartitions, not append: a re-run of a torn iteration
        # replaces exactly its own partition (idempotent resume)
        df.writeTo(tbl).overwritePartitions()

    def load_state(self, algo: str, iteration: int) -> DataFrame:
        return self.spark.table(self._tbl(f"{algo}_state")).filter(
            F.col("iteration") == iteration
        )

    def overwrite_partitions(self, df: DataFrame, name: str, partition_cols: list[str]) -> None:
        df.writeTo(self._tbl(name)).overwritePartitions()

    def merge(self, updates: DataFrame, name: str, key_cols: list[str], ts_col: str) -> None:
        deduped = dedupe_batch(updates, key_cols, ts_col)
        deduped.createOrReplaceTempView("__updates")
        self.spark.sql(merge_sql(self._tbl(name), updates.columns, key_cols, ts_col))
