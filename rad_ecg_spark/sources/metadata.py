"""Header-only metadata scan: read parquet FOOTERS, never row groups.

The reference scans binary .ebm headers to size and validate a recording
before touching samples (/root/reference/src/rad_ecg/scripts/lib_ebm/
tools.py:17-88, pyebmreader.py:61-141). Spark-first analog over a
parquet lake: list the files, fan the paths out, and read each file's
footer metadata (row counts, byte sizes, per-column min/max stats) with
pyarrow — a few KB of I/O per file regardless of file size. This is
what drives partition pruning decisions and ingest validation without a
data scan.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

META_SCHEMA = (
    "path string, n_rows long, n_row_groups int, n_columns int, "
    "file_bytes long, created_by string"
)


def _list_parquet(root: str) -> list[str]:
    if os.path.isfile(root):
        return [root]
    paths = []
    for dirpath, _dirs, files in os.walk(root):
        paths.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return paths


def parquet_footer_scan(spark: SparkSession, root: str) -> DataFrame:
    """One row per parquet file under ``root`` from footer metadata only."""
    paths = _list_parquet(root)
    if not paths:
        return spark.createDataFrame([], META_SCHEMA)
    pdf = spark.createDataFrame(
        [(p,) for p in sorted(paths)], "path string"
    ).repartition(min(len(paths), 32))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for p in b["path"]:
                md = pq.ParquetFile(p).metadata  # footer read only
                rows.append(
                    (
                        p,
                        md.num_rows,
                        md.num_row_groups,
                        md.num_columns,
                        os.path.getsize(p),
                        md.created_by or "",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "n_rows",
                    "n_row_groups",
                    "n_columns",
                    "file_bytes",
                    "created_by",
                ],
            )

    return pdf.mapInPandas(scan, META_SCHEMA)


def column_stats(spark: SparkSession, root: str, column: str) -> DataFrame:
    """Per-row-group min/max for ``column`` from footer statistics —
    the input to skip-scan / partition pruning."""
    paths = _list_parquet(root)
    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for b in batches:
            out = {"path": [], "row_group": [], "n_rows": [], "vmin": [], "vmax": []}
            for p in b["path"]:
                f = pq.ParquetFile(p)
                names = f.schema_arrow.names
                if column not in names:
                    continue
                ci = names.index(column)
                for rg in range(f.metadata.num_row_groups):
                    col = f.metadata.row_group(rg).column(ci)
                    st = col.statistics
                    out["path"].append(p)
                    out["row_group"].append(rg)
                    out["n_rows"].append(f.metadata.row_group(rg).num_rows)
                    out["vmin"].append(str(st.min) if st and st.has_min_max else None)
                    out["vmax"].append(str(st.max) if st and st.has_min_max else None)
            yield pd.DataFrame(out)

    return pdf.mapInPandas(
        scan, "path string, row_group int, n_rows long, vmin string, vmax string"
    )
