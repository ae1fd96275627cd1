"""Relational operator coverage (SURVEY.md §2) over the TPC-H-ish
testdata, each with an exact DuckDB oracle.

Operator → reference capability mapping is in each docstring. All
aggregates over doubles use the cents-bigint policy (see queries/
__init__.py) so value hashes match the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col):
    return F.round(col * 100).cast("long")


# --- 1. pricing summary (TPC-H Q1 shape; groupBy + multi-agg) ---------
# ref analog: per-section multi-metric aggregation, peak_detect_v4.py:1585-1637

def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style pricing summary at ROLLUP levels: the detail grain
    (l_returnflag, l_linestatus), per-flag subtotals, and the grand
    total in one pass (registry consolidation of the former
    pricing_summary + rollup_revenue — same operators, one query)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_c"),
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


# --- 2. inter-event interval stats (HR/SDNN/RMSSD analog) --------------
# ref: RR-interval stats per section, peak_detect_v4.py:1585-1606

def q_interval_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.withColumn("prev_ms", F.lag(F.unix_millis(F.col("ts").cast("timestamp"))).over(w))
        .filter(F.col("prev_ms").isNotNull())
        # integer-div to seconds: keeps sum-of-squares inside int64 at
        # any scale factor (ms² sums would overflow ANSI long)
        .withColumn(
            "diff_s", F.expr("(unix_millis(cast(ts as timestamp)) - prev_ms) div 1000")
        )
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("diff_s").alias("sum_s"),
            F.sum(F.col("diff_s") * F.col("diff_s")).alias("sum_s2"),
        )
        # filter BEFORE the formula: n=1 would hit ANSI division-by-zero
        .filter(F.col("n_intervals") >= 2)
        .withColumn(
            # SDNN-style: explicit two-pass formula over EXACT integer
            # sums -> identical doubles in both engines
            "sdnn_e6",
            F.round(
                F.sqrt(
                    (
                        F.col("sum_s2")
                        - F.col("sum_s") * F.col("sum_s") / F.col("n_intervals")
                    )
                    / (F.col("n_intervals") - 1)
                )
                * 1e6
            ).cast("long"),
        )
    )


ORACLE_INTERVALS = """
WITH d AS (
  SELECT user_id,
         (epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000 AS diff_s
  FROM events
), g AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
         CAST(sum(diff_s) AS BIGINT) AS sum_s,
         CAST(sum(diff_s*diff_s) AS BIGINT) AS sum_s2
  FROM d WHERE diff_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_intervals, sum_s, sum_s2,
  CAST(round(sqrt((sum_s2 - CAST(sum_s AS DOUBLE)*sum_s/n_intervals)/(n_intervals-1)) * 1e6) AS BIGINT) AS sdnn_e6
FROM g WHERE n_intervals >= 2"""


# --- 3. sessionization (gaps-and-islands) ------------------------------
# ref: run grouping / split-on-gap, peak_detect_v4.py:1350-1353

def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = 30 * 60 * 1000  # 30 min in ms
    s = (
        ev.withColumn("prev_ms", F.lag(F.unix_millis(F.col("ts").cast("timestamp"))).over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ms").isNull()
                | (F.unix_millis(F.col("ts").cast("timestamp")) - F.col("prev_ms") > gap),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
    )
    per_sess = s.groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("n"))
    sess = per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n").alias("max_session_events"),
        F.sum("n").alias("n_events"),
    )
    # longest valid streak (consecutive_valid_peaks analog, registry
    # consolidation of the former longest_streak query): gaps-and-islands
    # over the SAME per-user event order. coalesce: a NULL value is
    # INVALID and breaks the streak, exactly like the oracle's CASE WHEN
    # ... ELSE 0 (a bare (value > 250) would yield NULL and be skipped by
    # sum()). ref: streak detection, peak_detect_v4.py:970-985
    v = (
        ev.withColumn(
            "valid", F.coalesce(F.col("value") > 250, F.lit(False)).cast("int")
        )
        .withColumn("inv_run", F.sum(1 - F.col("valid")).over(w))
    )
    runs = (
        v.filter(F.col("valid") == 1)
        .groupBy("user_id", "inv_run")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    streak = runs.groupBy("user_id").agg(F.max("len").alias("longest_streak"))
    return sess.join(streak, "user_id", "left").select(
        "user_id",
        "n_sessions",
        "max_session_events",
        "n_events",
        F.coalesce("longest_streak", F.lit(0)).alias("longest_streak"),
    )


ORACLE_SESSIONIZE = """
WITH s AS (
  SELECT user_id, event_id,
    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
         THEN 1 ELSE 0 END AS new_sess, ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s2 AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
  FROM s
), per_sess AS (
  SELECT user_id, sess_id, count(*) AS n FROM s2 GROUP BY user_id, sess_id
), sess AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(max(n) AS BIGINT) AS max_session_events,
         CAST(sum(n) AS BIGINT) AS n_events
  FROM per_sess GROUP BY user_id
), vs AS (
  SELECT user_id,
    CASE WHEN value > 250 THEN 1 ELSE 0 END AS valid,
    sum(CASE WHEN value > 250 THEN 0 ELSE 1 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS inv_run
  FROM events
), runs AS (
  SELECT user_id, inv_run, count(*) AS len FROM vs WHERE valid = 1
  GROUP BY user_id, inv_run
), streak AS (
  SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
  FROM runs GROUP BY user_id
)
SELECT sess.user_id, n_sessions, max_session_events, n_events,
       CAST(coalesce(streak.longest_streak, 0) AS BIGINT) AS longest_streak
FROM sess LEFT JOIN streak ON sess.user_id = streak.user_id"""


# --- 5. top-k per group (spectral-harmonics top-4 analog) ---------------
# ref: porcine/pig_extract.py:2222-2234

def q_topk_per_group(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_retailprice")
    )


ORACLE_TOPK = """
SELECT p_brand, CAST(rk AS INT) AS rk, p_partkey, p_retailprice FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part) WHERE rk <= 3"""


# --- 6. range (interval) join: price bands ------------------------------
# ref: interval containment join, peak_detect_v4.py:1610-1615

BANDS = [(0.0, 930.0, "low"), (930.0, 970.0, "mid"), (970.0, 1e9, "high")]


def q_range_join_bands(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(BANDS, "lo double, hi double, band string")
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_cents(F.col("p_retailprice"))).alias("sum_price_c"),
        )
    )


ORACLE_BANDS = """
WITH bands(lo, hi, band) AS (VALUES (0.0, 930.0, 'low'),
                                    (930.0, 970.0, 'mid'),
                                    (970.0, 1000000000.0, 'high'))
SELECT band, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band"""


# --- 7. as-of join (discord <-> invalid-peak tolerance match analog) ----
# ref: ml/anomaly/stump_anom.py:92-103

def q_asof_purchase_click(spark, sf_dir):
    """For each purchase, the most recent prior click by the same user.
    Implemented scalably as a union + running last_value, not a
    per-row subquery."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("eid"),
        F.lit(0).alias("is_p"), F.lit(None).cast("long").alias("p_eid"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("eid"),
        F.lit(1).alias("is_p"), F.col("event_id").alias("p_eid"),
    )
    # order by (ts, is_p, eid): a click at the exact same ts sorts before
    # the purchase, matching ASOF's ts >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "is_p", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = clicks.unionByName(purch).withColumn(
        "last_click",
        F.last(F.when(F.col("is_p") == 0, F.col("eid")), ignorenulls=True).over(w),
    )
    return (
        tagged.filter((F.col("is_p") == 1) & F.col("last_click").isNotNull())
        .select(
            F.col("eid").alias("purchase_id"),
            F.col("user_id"),
            F.col("last_click").alias("click_id"),
        )
    )


ORACLE_ASOF = """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts"""


# --- 8. IQR outlier gate (porcine IQR filter analog) --------------------
# ref: porcine/pig_extract.py:2459-2492
#
# Exactness-for-oracle tradeoff, documented: F.percentile is EXACT (it
# sorts each group) because the DuckDB hash gate demands bit-identical
# quantiles. At 100TB swap the two percentile() calls for
# percentile_approx(value, [0.25, 0.75], 10_000) — a single-pass
# mergeable sketch (no per-group sort); the 1.5*IQR gate is insensitive
# to the sketch's bounded rank error.

def q_moment_stats(spark, sf_dir):
    """One-pass per-type statistical profile (registry consolidation of
    the former grouped_describe + variability_index + correlation_exact
    + iqr_outliers — identical operator mechanics, one scan for the
    moment sums + one broadcast-joined scan for the IQR outlier gate):

    - describe: n / integer mean / sample std / min / max from exact
      integer sums (ml/anomaly/ml_anom.py:183-211)
    - QTVI-style log-variability index (peak_detect_v4.py:1222-1248)
    - exact Pearson corr(value_cents, hour) via integer sums
      (ml/anomaly/ml_anom.py:351-392)
    - IQR outlier count at 1.5x fences from exact percentiles
    """
    ev = _t(spark, sf_dir, "events").withColumn("cents", _cents(F.col("value"))).withColumn(
        "y", F.hour(F.col("ts").cast("timestamp")).cast("long")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        F.min("cents").alias("min_c"),
        F.max("cents").alias("max_c"),
        F.sum("y").alias("sy"),
        F.sum(F.col("cents") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    outl = (
        ev.join(F.broadcast(g.select("event_type", "q1", "q3")), "event_type")
        .withColumn(
            "is_outlier",
            (
                (F.col("value") < F.col("q1") - 1.5 * iqr)
                | (F.col("value") > F.col("q3") + 1.5 * iqr)
            ).cast("int"),
        )
        .groupBy("event_type")
        .agg(F.sum("is_outlier").alias("n_outliers"))
    )
    # sample variance / mean from exact integer sums -> identical doubles
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    corr_num = F.col("n") * F.col("sxy") - F.col("s1") * F.col("sy")
    corr_den = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return g.join(outl, "event_type").select(
        "event_type",
        "n",
        F.expr("s1 DIV n").alias("mean_c"),
        F.floor(F.sqrt(var) * 1e6 + 0.5).cast("long").alias("std_e6"),
        "min_c",
        "max_c",
        F.round(F.log10(var / (mean * mean)) * 1e6).cast("long").alias("vi_e6"),
        F.round(corr_num / corr_den * 1e9).cast("long").alias("corr_hour_e9"),
        "n_outliers",
    )


ORACLE_MOMENT_STATS = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(round(value*100) AS BIGINT) * CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s2,
         CAST(min(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS min_c,
         CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_c,
         CAST(sum(CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(round(value*100) AS BIGINT) * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(EXTRACT(hour FROM ts) AS BIGINT) * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS BIGINT) AS syy,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
), o AS (
  SELECT e.event_type,
    CAST(sum(CASE WHEN e.value < g.q1 - 1.5*(g.q3-g.q1)
                    OR e.value > g.q3 + 1.5*(g.q3-g.q1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM events e JOIN g USING (event_type)
  GROUP BY e.event_type
)
SELECT g.event_type, n, CAST(s1 // n AS BIGINT) AS mean_c,
       CAST(floor(sqrt((s2 - s1 * s1 / n) / (n - 1)) * 1e6 + 0.5) AS BIGINT) AS std_e6,
       min_c, max_c,
       CAST(round(log10(((s2 - CAST(s1 AS DOUBLE)*s1/n)/(n-1)) /
            ((CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))) * 1e6) AS BIGINT) AS vi_e6,
       CAST(round((n*sxy - s1*sy) / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) * 1e9) AS BIGINT) AS corr_hour_e9,
       o.n_outliers
FROM g JOIN o ON g.event_type = o.event_type"""


# --- 9. mode per group (label-attach analog) ----------------------------
# ref: porcine/pig_extract.py:1007

def q_user_profile(spark, sf_dir):
    """Per-user feature profile (registry consolidation of the former
    mode_per_user + nn50_pnn50 — same operator mechanics, one query):
    modal event type via min_by on a (-count, type) struct
    (porcine/pig_extract.py:1007) plus NN50/PNN50 successive-difference
    counts over the per-user event order (backups/v3.1
    peak_detect_v3.py:1652-1653)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    mode = counts.groupBy("user_id").agg(
        F.min_by(
            "event_type", F.struct((-F.col("c")).alias("nc"), F.col("event_type"))
        ).alias("modal_type"),
        F.max("c").alias("modal_count"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.withColumn("cents", _cents(F.col("value")))
        .withColumn("diff", F.col("cents") - F.lag("cents").over(w))
    )
    nn = d.groupBy("user_id").agg(
        F.count("diff").alias("n_diffs"),
        F.sum((F.abs(F.col("diff")) > 5000).cast("long")).alias("nn50"),
    )
    return mode.join(nn, "user_id", "left").select(
        "user_id",
        "modal_type",
        "modal_count",
        F.coalesce("n_diffs", F.lit(0)).alias("n_diffs"),
        F.coalesce("nn50", F.lit(0)).alias("nn50"),
        F.when(F.col("n_diffs") > 0, F.expr("(nn50 * 1000000) DIV n_diffs"))
        .otherwise(F.lit(0))
        .alias("pnn50_e6"),
    )


ORACLE_USER_PROFILE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, event_type, c,
         row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
  FROM counts
), mode AS (
  SELECT user_id, event_type AS modal_type, CAST(c AS BIGINT) AS modal_count
  FROM r WHERE rn = 1
), d AS (
  SELECT user_id,
         CAST(round(value*100) AS BIGINT)
           - lag(CAST(round(value*100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff
  FROM events
), nn AS (
  SELECT user_id, CAST(count(diff) AS BIGINT) AS n_diffs,
         CAST(sum(CASE WHEN abs(diff) > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS nn50
  FROM d GROUP BY user_id
)
SELECT mode.user_id, modal_type, modal_count,
       CAST(coalesce(nn.n_diffs, 0) AS BIGINT) AS n_diffs,
       CAST(coalesce(nn.nn50, 0) AS BIGINT) AS nn50,
       CAST(CASE WHEN nn.n_diffs > 0 THEN (nn.nn50 * 1000000) // nn.n_diffs
                 ELSE 0 END AS BIGINT) AS pnn50_e6
FROM mode LEFT JOIN nn ON mode.user_id = nn.user_id"""


# --- 10. semi/anti joins (set membership analog) ------------------------
# ref: set ops, peak_detect_v4.py:1713-1723

def q_semi_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_o = cust.join(orders, "c_custkey", "left_semi")
    without_o = cust.join(orders, "c_custkey", "left_anti")
    return (
        with_o.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
        .join(
            without_o.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).alias("n_without_orders")
            ),
            "c_mktsegment",
            "outer",
        )
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


ORACLE_SEMI_ANTI = """
WITH w AS (
  SELECT c_mktsegment, count(*) AS n FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY 1
), wo AS (
  SELECT c_mktsegment, count(*) AS n FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY 1
)
SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       CAST(coalesce(w.n, 0) AS BIGINT) AS n_with_orders,
       CAST(coalesce(wo.n, 0) AS BIGINT) AS n_without_orders
FROM w FULL OUTER JOIN wo USING (c_mktsegment)"""


# --- 11. multi-gate fail-reason classification (SQI gates analog) -------
# ref: threshold gates + reason strings, peak_detect_v4.py:208-233

def q_fail_reasons(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    reason = F.concat_ws(
        "|",
        F.when(F.col("value") < 1.0, F.lit("low_value")),
        F.when(F.col("event_type") == "error", F.lit("error_type")),
        F.when(F.hour("ts") < 6, F.lit("night")),
    )
    return (
        ev.withColumn(
            "fail_reason",
            F.when(reason == "", F.lit("ok")).otherwise(reason),
        )
        .groupBy("fail_reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_FAIL_REASONS = """
WITH t AS (
  SELECT concat_ws('|',
    CASE WHEN value < 1.0 THEN 'low_value' END,
    CASE WHEN event_type = 'error' THEN 'error_type' END,
    CASE WHEN EXTRACT(hour FROM ts) < 6 THEN 'night' END) AS r
  FROM events
)
SELECT CASE WHEN r = '' THEN 'ok' ELSE r END AS fail_reason,
       CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1"""


# --- 12. rolling exact median (roll_med analog) --------------------------
# ref: utils.py:54-76 (centered rolling median)

def q_rolling_median(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    return ev.select(
        "event_id",
        F.round(F.expr("percentile(value, 0.5)").over(w) * 100)
        .cast("long")
        .alias("roll_med_c"),
    )


ORACLE_ROLLING_MEDIAN = """
SELECT event_id,
  CAST(round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 100) AS BIGINT) AS roll_med_c
FROM events"""


# --- 13. per-group baseline normalization --------------------------------
# ref: porcine/pig_extract.py:3237-3279

def q_trailing_norm(spark, sf_dir):
    """Per-user baseline normalization over ONE window partition
    (registry consolidation of the former baseline_norm +
    trailing_baseline — same operator mechanics, one query): first-10-row
    leading baseline delta (porcine/pig_extract.py:3237-3279) plus the
    trailing deque-maxlen-6 history stats and 2x anomaly gate
    (peak_detect_v4.py:106-109), all per event row."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = w.rowsBetween(-6, -1)
    r = (
        ev.withColumn("cents", _cents(F.col("value")))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("hist_n", F.count("cents").over(hist))
        .withColumn(
            "hist_sum", F.coalesce(F.sum("cents").over(hist), F.lit(0))
        )
    )
    base = (
        r.filter(F.col("rn") <= 10)
        .groupBy("user_id")
        .agg(
            F.sum("cents").alias("bl_sum"),
            F.count(F.lit(1)).alias("bl_n"),
        )
    )
    return (
        r.join(F.broadcast(base), "user_id")
        .select(
            "event_id",
            "user_id",
            "cents",
            "hist_n",
            "hist_sum",
            # anomaly gate vs trailing mean, exact integer cross-multiply
            (F.col("cents") * F.col("hist_n") > F.lit(2) * F.col("hist_sum")).alias(
                "above_2x_baseline"
            ),
            F.round(
                (F.col("cents") - F.col("bl_sum") / F.col("bl_n")).cast("double") * 1e6
            )
            .cast("long")
            .alias("delta_e6"),
        )
    )


ORACLE_TRAILING_NORM = """
WITH r AS (
  SELECT event_id, user_id,
         CAST(round(value*100) AS BIGINT) AS cents,
         row_number() OVER w AS rn,
         CAST(count(*) OVER w2 AS BIGINT) AS hist_n,
         CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)) OVER w2, 0) AS BIGINT) AS hist_sum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
), base AS (
  SELECT user_id, sum(cents) AS bl_sum, count(*) AS bl_n
  FROM r WHERE rn <= 10 GROUP BY user_id
)
SELECT r.event_id, r.user_id, r.cents, r.hist_n, r.hist_sum,
  r.cents * r.hist_n > 2 * r.hist_sum AS above_2x_baseline,
  CAST(round((r.cents - CAST(base.bl_sum AS DOUBLE)/base.bl_n) * 1e6) AS BIGINT) AS delta_e6
FROM r JOIN base USING (user_id)"""


# --- 14. similarity join (fuzzy channel-name match analog) ---------------
# ref: porcine/pig_extract.py:1458-1532

def q_levenshtein_match(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_name")
    )
    pairs = sup.crossJoin(F.broadcast(cust)).withColumn(
        "lev", F.levenshtein("s_name", "c_name")
    )
    best = pairs.groupBy("s_suppkey").agg(F.min("lev").alias("min_lev"))
    return (
        pairs.join(best, "s_suppkey")
        .filter(F.col("lev") == F.col("min_lev"))
        .groupBy("s_suppkey", "min_lev")
        .agg(F.count(F.lit(1)).alias("n_best"), F.min("c_name").alias("first_match"))
    )


ORACLE_LEVENSHTEIN = """
WITH pairs AS (
  SELECT s_suppkey, c_name, levenshtein(s_name, c_name) AS lev
  FROM supplier, customer WHERE c_custkey <= 200
), best AS (
  SELECT s_suppkey, min(lev) AS min_lev FROM pairs GROUP BY s_suppkey
)
SELECT p.s_suppkey, CAST(b.min_lev AS INT) AS min_lev,
       CAST(count(*) AS BIGINT) AS n_best, min(p.c_name) AS first_match
FROM pairs p JOIN best b ON p.s_suppkey = b.s_suppkey AND p.lev = b.min_lev
GROUP BY p.s_suppkey, b.min_lev"""


# --- 15. tumbling-window aggregation (streaming-shaped, run in batch) ----
# ref: overlapping segmentation, utils.py:7-50 (here: non-overlapping)

def q_time_windows(spark, sf_dir):
    """Time-window aggregation, tumbling AND sliding in one result
    (registry consolidation of the former tumbling_window +
    sliding_window — both F.window mechanics preserved, tagged by
    ``kind``): 6h tumbling buckets per event type, plus 6h windows
    sliding every 90 min (20%-overlap segmentation analog,
    utils.py:7-50)."""
    ev = _t(spark, sf_dir, "events")
    tum = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("sum_value_c"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.unix_timestamp(F.col("w.start")).alias("wstart_s"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )
    sli = (
        ev.groupBy(F.window("ts", "6 hours", "90 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("sum_value_c"),
        )
        .select(
            F.lit("sliding").alias("kind"),
            F.unix_timestamp(F.col("w.start")).alias("wstart_s"),
            F.lit(None).cast("string").alias("event_type"),
            "n",
            "sum_value_c",
        )
    )
    return tum.unionByName(sli)


# every event falls in exactly window/slide = 4 sliding windows whose
# starts are the k=0..3 slide-aligned points at or before ts
ORACLE_TIME_WINDOWS = """
SELECT 'tumbling' AS kind,
       CAST(epoch(time_bucket(INTERVAL 6 HOUR, ts)) AS BIGINT) AS wstart_s,
       event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind,
       CAST(floor(epoch(ts) / 5400) AS BIGINT) * 5400 - k.k * 5400 AS wstart_s,
       CAST(NULL AS VARCHAR) AS event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
GROUP BY 2"""


# --- 16. pivot-style conditional aggregation -----------------------------
# ref: grouped describe, ml/anomaly/ml_anom.py:183-211

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_daily_activity(spark, sf_dir):
    """Daily activity report (registry consolidation of the former
    pivot_event_dow + daily_distinct_users — pivot-style conditional
    aggregation AND exact distinct counting, one query): per day, the
    distinct active users, total events, day-of-week, and the per-type
    event counts pivoted into columns (ml/anomaly/ml_anom.py:183-211;
    distinct counts support.py:328)."""
    ev = _t(spark, sf_dir, "events")
    type_aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.first(F.dayofweek("ts")).alias("dow"),
            *type_aggs,
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_users",
            "n_events",
            "dow",
            *[f"n_{t}" for t in EVENT_TYPES],
        )
    )


ORACLE_DAILY_ACTIVITY = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(min(dayofweek(ts) + 1) AS INT) AS dow,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1"""


# --- salted hot-key join (supernode mitigation on a relational path) -----
# ref shape: oversized-work-unit rerouting, peak_detect_v4.py:1664-1679.
# ~75% of events are planted onto ONE key; salted_join fans that key over
# n_salts subtasks (balance asserted in tests/test_kernels_and_io.py) and
# the result equals the plain inner join — which is what the oracle runs.

def q_salted_hot_join(spark, sf_dir):
    from rad_ecg_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 4 < 3, F.lit(1))
        .otherwise(F.pmod(F.col("user_id"), F.lit(50)) + 1)
        .cast("long")
        .alias("k"),
        _cents(F.col("value")).alias("vc"),
        "event_id",
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    # event_id is the table's primary key -> deterministic per-row salt
    j = salted_join(ev, dim, "k", n_salts=8, unique_col="event_id")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("sum_cents")
    )


ORACLE_SALTED_HOT_JOIN = """
WITH ev AS (
  SELECT CASE WHEN event_id % 4 < 3 THEN 1 ELSE user_id % 50 + 1 END AS k,
         CAST(round(value*100) AS BIGINT) AS vc
  FROM events
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vc) AS BIGINT) AS sum_cents
FROM ev JOIN customer ON c_custkey = k
GROUP BY 1"""


# Registry consolidation (round 4): near-duplicate queries are merged so
# every entry fits the driver's 50-row CORRECTNESS window —
#   pricing_summary      <- + rollup_revenue        (ROLLUP levels)
#   sessionize           <- + longest_streak        (same window partition)
#   moment_stats         <- grouped_describe + variability_index
#                           + correlation_exact + iqr_outliers
#   user_profile         <- mode_per_user + nn50_pnn50
#   trailing_norm        <- baseline_norm + trailing_baseline
#   time_windows         <- tumbling_window + sliding_window
#   daily_activity       <- pivot_event_dow + daily_distinct_users
# The operator mechanics of every absorbed query are preserved inside the
# merged one (documented in each docstring).
RELATIONAL_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "interval_stats": q_interval_stats,
    "sessionize": q_sessionize,
    "topk_per_group": q_topk_per_group,
    "range_join_bands": q_range_join_bands,
    "asof_purchase_click": q_asof_purchase_click,
    "moment_stats": q_moment_stats,
    "user_profile": q_user_profile,
    "semi_anti_join": q_semi_anti,
    "fail_reasons": q_fail_reasons,
    "rolling_median": q_rolling_median,
    "trailing_norm": q_trailing_norm,
    "levenshtein_match": q_levenshtein_match,
    "time_windows": q_time_windows,
    "daily_activity": q_daily_activity,
    "salted_hot_join": q_salted_hot_join,
}

RELATIONAL_ORACLES = {
    "pricing_summary": ORACLE_PRICING,
    "interval_stats": ORACLE_INTERVALS,
    "sessionize": ORACLE_SESSIONIZE,
    "topk_per_group": ORACLE_TOPK,
    "range_join_bands": ORACLE_BANDS,
    "asof_purchase_click": ORACLE_ASOF,
    "moment_stats": ORACLE_MOMENT_STATS,
    "user_profile": ORACLE_USER_PROFILE,
    "semi_anti_join": ORACLE_SEMI_ANTI,
    "fail_reasons": ORACLE_FAIL_REASONS,
    "rolling_median": ORACLE_ROLLING_MEDIAN,
    "trailing_norm": ORACLE_TRAILING_NORM,
    "levenshtein_match": ORACLE_LEVENSHTEIN,
    "time_windows": ORACLE_TIME_WINDOWS,
    "daily_activity": ORACLE_DAILY_ACTIVITY,
    "salted_hot_join": ORACLE_SALTED_HOT_JOIN,
}


# --- 19. per-column null report (EDA null audit analog) ------------------
# ref: ml/anomaly/ml_anom.py:114-179

def q_null_report(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ]
    return ev.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


ORACLE_NULL_REPORT = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_id,
  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ts,
  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user_id,
  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_props
FROM events"""


# --- 21. set operations (union / intersect / except) ---------------------
# ref: set ops, peak_detect_v4.py:1713-1723; SURVEY §2.7

def q_set_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers)
    only_click = clickers.subtract(buyers)  # EXCEPT (distinct)
    either = clickers.union(buyers).distinct()

    # one declarative plan, ONE job — no driver-side .count() loops
    def seg(name, d):
        return d.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("segment"), "n_users"
        )

    return (
        seg("both", both)
        .unionByName(seg("click_only", only_click))
        .unionByName(seg("either", either))
    )


ORACLE_SET_OPS = """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
     b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'both' AS segment, CAST(count(*) AS BIGINT) AS n_users FROM (SELECT * FROM c INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'click_only', CAST(count(*) AS BIGINT) FROM (SELECT * FROM c EXCEPT SELECT * FROM b)
UNION ALL
SELECT 'either', CAST(count(*) AS BIGINT) FROM (SELECT * FROM c UNION SELECT * FROM b)"""


RELATIONAL_QUERIES.update({
    "null_report": q_null_report,
    "set_ops": q_set_ops,
})
RELATIONAL_ORACLES.update({
    "null_report": ORACLE_NULL_REPORT,
    "set_ops": ORACLE_SET_OPS,
})


# --- 24. mean imputation (na.fill analog, per-group mean) ------------------
# ref: fillna mean/median/mode, porcine/pig_extract.py:2409-2444

def q_impute_mean(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # deterministically poke holes (testdata has no NULL values), then
    # fill each hole with its event_type's integer mean
    holed = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 97 == 0, F.lit(None))
        .otherwise(_cents(F.col("value")))
        .alias("cents"),
    )
    means = holed.groupBy("event_type").agg(
        F.sum("cents").alias("s"), F.count("cents").alias("c")
    )
    return (
        holed.join(F.broadcast(means), "event_type")
        .select(
            "event_id",
            "event_type",
            F.coalesce(F.col("cents"), F.expr("s DIV c")).alias("imputed_c"),
            F.col("cents").isNull().alias("was_null"),
        )
    )


ORACLE_IMPUTE = """
WITH holed AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 97 = 0 THEN NULL
              ELSE CAST(round(value*100) AS BIGINT) END AS cents
  FROM events
), m AS (
  SELECT event_type, CAST(sum(cents) AS BIGINT) // count(cents) AS mean_c
  FROM holed GROUP BY event_type
)
SELECT event_id, h.event_type,
       CAST(coalesce(cents, mean_c) AS BIGINT) AS imputed_c,
       cents IS NULL AS was_null
FROM holed h JOIN m ON h.event_type = m.event_type"""


# --- 28. cross-channel alignment (wide columns per time bucket) ------------
# ref: multi-channel dict-of-arrays alignment, porcine/pig_extract.py:1370-1423

def q_channel_align(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hour = (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600) * 3600).alias(
        "hour_s"
    )

    def chan(t):
        return (
            ev.filter(F.col("event_type") == t)
            .select(hour, "user_id", _cents(F.col("value")).alias("c"))
            .groupBy("hour_s", "user_id")
            .agg(F.sum("c").alias(f"{t}_c"))
        )

    return (
        chan("click")
        .join(chan("purchase"), ["hour_s", "user_id"])
        .select(
            "hour_s",
            "user_id",
            "click_c",
            "purchase_c",
            (F.col("purchase_c") - F.col("click_c")).alias("diff_c"),
        )
    )


ORACLE_CHANNEL = """
WITH c AS (
  SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS hour_s, user_id,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS click_c
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), p AS (
  SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS hour_s, user_id,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS purchase_c
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.hour_s, c.user_id, click_c, purchase_c,
       CAST(purchase_c - click_c AS BIGINT) AS diff_c
FROM c JOIN p ON c.hour_s = p.hour_s AND c.user_id = p.user_id"""


# --- 29. OLS fit + VIF from exact integer sums ------------------------------
# ref: regression + VIF, ml/anomaly/ml_anom.py:351-392,1300-1545

def q_ols_fit(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    g = (
        ev.withColumn("x", _cents(F.col("value")))
        .withColumn("y", F.hour(F.col("ts").cast("timestamp")).cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / denx
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    r2 = (num * num) / (denx * deny)
    vif = F.lit(1.0) / (F.lit(1.0) - r2)
    return g.select(
        "event_type",
        "n",
        F.floor(slope * 1e9 + 0.5).cast("long").alias("slope_e9"),
        F.floor(intercept * 1e6 + 0.5).cast("long").alias("intercept_e6"),
        F.floor(r2 * 1e9 + 0.5).cast("long").alias("r2_e9"),
        F.floor(vif * 1e9 + 0.5).cast("long").alias("vif_e9"),
    )


ORACLE_OLS = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(value*100) AS BIGINT) * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(value*100) AS BIGINT) * CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(EXTRACT(hour FROM ts) AS BIGINT) * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS BIGINT) AS syy
  FROM events GROUP BY event_type
), d AS (
  SELECT event_type, n,
    CAST(n*sxy - sx*sy AS DOUBLE) AS num,
    CAST(n*sxx - sx*sx AS DOUBLE) AS denx,
    CAST(n*syy - sy*sy AS DOUBLE) AS deny,
    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
    CAST(n AS DOUBLE) AS nd
  FROM g
)
SELECT event_type, n,
  CAST(floor((num / denx) * 1e9 + 0.5) AS BIGINT) AS slope_e9,
  CAST(floor(((syd - (num / denx) * sxd) / nd) * 1e6 + 0.5) AS BIGINT) AS intercept_e6,
  CAST(floor(((num * num) / (denx * deny)) * 1e9 + 0.5) AS BIGINT) AS r2_e9,
  CAST(floor((1.0 / (1.0 - (num * num) / (denx * deny))) * 1e9 + 0.5) AS BIGINT) AS vif_e9
FROM d"""

RELATIONAL_QUERIES.update({
    "impute_mean": q_impute_mean,
    "channel_align": q_channel_align,
    "ols_fit": q_ols_fit,
})
RELATIONAL_ORACLES.update({
    "impute_mean": ORACLE_IMPUTE,
    "channel_align": ORACLE_CHANNEL,
    "ols_fit": ORACLE_OLS,
})


# --- 30. distribution-shift between consecutive windows --------------------
# ref: distribution-shift gating between sections, porcine/stumpy_discord.py
# (median/MAD shift checks); SURVEY §2.9 "distribution sketches between
# windows". Exact-integer total-variation numerator:
#   tv_num = sum_bins |p_i*Nq - q_i*Np|   (TV = tv_num / (2*Np*Nq))
# so the oracle hash-matches without any cross-row double summation.

def q_dist_shift(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    win = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 21600).alias("w")
    binc = F.floor(F.col("value") / 50).cast("long").alias("bin")
    hist = ev.select(win, binc).groupBy("w", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    totals = ev.select(win).groupBy("w").agg(F.count(F.lit(1)).alias("total"))
    cur = hist.select("w", "bin", F.col("cnt").alias("p"))
    nxt = hist.select((F.col("w") - 1).alias("w"), "bin", F.col("cnt").alias("q"))
    j = (
        cur.join(nxt, ["w", "bin"], "full_outer")
        .na.fill({"p": 0, "q": 0})
        .join(totals.select("w", F.col("total").alias("np")), "w")
        .join(
            totals.select((F.col("w") - 1).alias("w"), F.col("total").alias("nq")), "w"
        )
    )
    return j.groupBy("w", "np", "nq").agg(
        F.sum(F.abs(F.col("p") * F.col("nq") - F.col("q") * F.col("np"))).alias(
            "tv_num"
        ),
        F.count(F.lit(1)).alias("n_bins"),
    )


ORACLE_DIST_SHIFT = """
WITH hist AS (
  SELECT CAST(floor(epoch(ts)/21600) AS BIGINT) AS w,
         CAST(floor(value/50) AS BIGINT) AS bin, count(*) AS cnt
  FROM events GROUP BY 1, 2
), totals AS (
  SELECT CAST(floor(epoch(ts)/21600) AS BIGINT) AS w, count(*) AS total
  FROM events GROUP BY 1
), j AS (
  SELECT coalesce(c.w, n.w) AS w, coalesce(c.bin, n.bin) AS bin,
         coalesce(c.cnt, 0) AS p, coalesce(n.cnt, 0) AS q
  FROM hist c FULL OUTER JOIN (SELECT w - 1 AS w, bin, cnt FROM hist) n
    ON c.w = n.w AND c.bin = n.bin
)
SELECT j.w, CAST(tp.total AS BIGINT) AS np, CAST(tn.total AS BIGINT) AS nq,
       CAST(sum(abs(p * tn.total - q * tp.total)) AS BIGINT) AS tv_num,
       CAST(count(*) AS BIGINT) AS n_bins
FROM j JOIN totals tp ON j.w = tp.w
       JOIN totals tn ON j.w = tn.w - 1
GROUP BY j.w, tp.total, tn.total"""

RELATIONAL_QUERIES.update({"dist_shift": q_dist_shift})
RELATIONAL_ORACLES.update({"dist_shift": ORACLE_DIST_SHIFT})


# --- 31. ordered block stitch (groupBy sort+concat) -------------------------
# ref: NPZ block stitcher, lib_adicht/load.py (per-channel ordered concat,
# porcine/pig_extract.py:1408-1423). collect_list -> array_sort rebuilds
# each user's value sequence in (ts, event_id) order INSIDE one row; the
# positional checksum sum((pos+1)*cents) proves the ordering bit-for-bit
# against the oracle's row_number formulation.

def q_stitch_checksum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    prepared = ev.select(
        "user_id",
        F.struct(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            F.col("event_id").alias("event_id"),
            _cents(F.col("value")).alias("cents"),
        ).alias("rec"),
    )
    arr = F.array_sort(F.collect_list("rec")).alias("arr")
    g = prepared.groupBy("user_id").agg(arr)
    acc0 = F.struct(F.lit(0).cast("long").alias("i"), F.lit(0).cast("long").alias("s"))
    chk = F.aggregate(
        F.col("arr"),
        acc0,
        lambda acc, x: F.struct(
            (acc["i"] + 1).alias("i"),
            (acc["s"] + (acc["i"] + 1) * x["cents"]).alias("s"),
        ),
    )
    return g.select(
        "user_id", F.size("arr").alias("n"), chk.getField("s").alias("checksum")
    )


ORACLE_STITCH = """
WITH o AS (
  SELECT user_id, CAST(round(value*100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn
  FROM events
)
SELECT user_id, CAST(count(*) AS INT) AS n,
       CAST(sum(rn * cents) AS BIGINT) AS checksum
FROM o GROUP BY user_id"""

RELATIONAL_QUERIES.update({"stitch_checksum": q_stitch_checksum})
RELATIONAL_ORACLES.update({"stitch_checksum": ORACLE_STITCH})
