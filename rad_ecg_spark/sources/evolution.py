"""Schema-evolution reads: old and new file generations in one table.

The reference carries a manual compatibility shim that computes columns
missing from old result files
(/root/reference/src/rad_ecg/scripts/ml/anomaly/ml_anom.py:60-78) and
keeps legacy columns newer versions stopped populating
(setup_globals.py:35-36). Spark-first shape: ``mergeSchema`` unions the
parquet footer schemas across generations, and a declared
defaults/derivations map fills what old files lack — schema-on-read
evolution without rewriting history.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolved(
    spark: SparkSession,
    path: str,
    defaults: Mapping[str, object] | None = None,
    derivations: Mapping[str, Callable[[DataFrame], Column]] | None = None,
) -> DataFrame:
    """Read a multi-generation parquet directory.

    - ``mergeSchema=true``: the table schema is the union over all file
      footers; files missing a column yield NULLs for it.
    - ``defaults``: column -> literal used where the column is NULL
      (old generations).
    - ``derivations``: column -> fn(df) -> Column, computed where the
      stored value is NULL — the "compute missing averaged columns"
      shim, declared once instead of scattered.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, lit in (defaults or {}).items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(lit)))
    for col, fn in (derivations or {}).items():
        if col in df.columns:  # fill NULLs left by old generations
            df = df.withColumn(col, F.coalesce(F.col(col), fn(df)))
        else:  # column no generation ever wrote: derive it outright
            df = df.withColumn(col, fn(df))
    return df
