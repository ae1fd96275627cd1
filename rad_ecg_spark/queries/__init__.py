"""Query registry: every implemented operator exposed as
(spark, sf_dir) -> DataFrame plus a DuckDB-equivalent oracle SQL string.

Float-determinism policy for oracle comparison: unordered SUM/AVG over
doubles differs between engines in the last ulp, so every aggregated
monetary/value column goes through a per-row exact cast
(cents = CAST(ROUND(x*100) AS BIGINT)) before summing, or is rounded
with a margin far wider than accumulated fp error. Raw (non-aggregated)
doubles hash identically and are passed through untouched.
"""

from rad_ecg_spark.queries.graph import GRAPH_ORACLES, GRAPH_QUERIES
from rad_ecg_spark.queries.kernels import KERNEL_ORACLES, KERNEL_QUERIES
from rad_ecg_spark.queries.relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES
from rad_ecg_spark.queries.textops import TEXT_ORACLES, TEXT_QUERIES

# Enumeration order matters: the driver's CORRECTNESS artifact holds at
# most 50 rows and takes queries in registry order, so the kernel
# queries (never driver-checked in r03 because they enumerated last) go
# FIRST. After the round-4 consolidation the registry is exactly 50
# entries, so every query fits the window — the ordering is belt-and-
# braces for future additions.
ALL_QUERIES = {**KERNEL_QUERIES, **TEXT_QUERIES, **GRAPH_QUERIES, **RELATIONAL_QUERIES}
ALL_ORACLES = {**KERNEL_ORACLES, **TEXT_ORACLES, **GRAPH_ORACLES, **RELATIONAL_ORACLES}
