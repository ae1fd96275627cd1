"""CSV source with explicit schema + PERMISSIVE corrupt-row capture.

The reference reads CSV result files back into downstream pipelines
(/root/reference/src/rad_ecg/scripts/ml/anomaly/ml_anom.py:1897-1902).
Spark-first shape: ``spark.read.csv`` with a DECLARED schema (never
inferSchema — schema inference is a full extra pass over the data and
non-deterministic under dirty rows at scale), PERMISSIVE mode, and a
``_corrupt_record`` column so malformed rows are quarantined instead of
killing a 100-TB ingest job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-first CSV scan; malformed rows land in _corrupt_record."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_lines).

    The scan is persisted first: Spark disallows reading a CSV when the
    pruned plan references ONLY the corrupt-record column, and the
    quarantine branch does exactly that — caching is the documented
    pattern (and at scale you want one scan feeding both branches
    anyway)."""
    df = df.persist()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, bad
