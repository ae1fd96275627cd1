"""Grouped-map kernels, skew-aware joins, partwise checkpoints, CSV
source, spark.ml stage — round-2 coverage tests."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestEpisodesUDTF:
    def test_known_episode_structure(self, spark):
        import datetime as dt

        from rad_ecg_spark.operators.episodes import detect_episodes

        t0 = dt.datetime(2024, 1, 1)
        m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
        rows = [
            # user 1: [300, 300], break, [400] -> two episodes
            (1, m(0), 1, "c", 300.0, ""),
            (2, m(1), 1, "c", 300.0, ""),
            (3, m(2), 1, "c", 100.0, ""),
            (4, m(3), 1, "c", 400.0, ""),
            # user 2: never above threshold -> zero episodes
            (5, m(0), 2, "c", 10.0, ""),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        got = {
            (r["user_id"], r["episode_id"]): (r["n_events"], r["sum_cents"], r["peak_cents"])
            for r in detect_episodes(ev, threshold=250.0).collect()
        }
        assert got == {
            (1, 1): (2, 60000, 30000),
            (1, 2): (1, 40000, 40000),
        }


class TestStatBundle:
    def test_matches_spark_builtin_kurtosis(self, spark):
        """The exact-integer kernel must agree with F.kurtosis (excess,
        population) to float tolerance on the same floor(value) ints."""
        from rad_ecg_spark.functions.statkernel import stat_bundle

        ev = spark.range(0, 500).select(
            F.lit("t").alias("event_type"),
            (F.pmod(F.xxhash64("id"), F.lit(400)) + F.lit(0.25)).cast("double").alias("value"),
        )
        bundle = stat_bundle(ev).collect()[0]
        ref = (
            ev.select(F.floor("value").cast("double").alias("v"))
            .agg(F.kurtosis("v").alias("k"), F.skewness("v").alias("s"))
            .collect()[0]
        )
        assert abs(bundle["kurt_e6"] / 1e6 - ref["k"]) < 1e-4
        assert abs(bundle["skew_e6"] / 1e6 - ref["s"]) < 1e-4


class TestSkewAwarePageRank:
    def test_star_graph_hub_path_balanced_and_exact(self, spark):
        """100k-spoke star: with hub_degree_threshold the hub's edges ride
        the broadcast path in BALANCED partitioning (max/median task rows
        < 4x), and ranks stay 1e-12-equal to the unsplit plan."""
        from rad_ecg_spark.operators.pagerank import pagerank
        from rad_ecg_spark.operators.skew import split_hub_edges

        n = 100_000
        edges = spark.range(1, n + 1, 1, 8).select(
            F.lit(0).alias("src"), F.col("id").alias("dst")
        )
        residual, hub_edges, hub_ids = split_hub_edges(edges, threshold=1000)
        assert residual.count() == 0
        assert {r["id"] for r in hub_ids.collect()} == {0}
        sizes = [
            r["n"]
            for r in hub_edges.repartition(8)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        assert max(sizes) / sorted(sizes)[len(sizes) // 2] < 4.0

        base = {
            r["id"]: r["rank"]
            for r in pagerank(edges, tol=0.0, max_iter=3).collect()
        }
        split = {
            r["id"]: r["rank"]
            for r in pagerank(
                edges, tol=0.0, max_iter=3, hub_degree_threshold=1000
            ).collect()
        }
        assert base.keys() == split.keys()
        assert all(abs(base[k] - split[k]) < 1e-12 for k in base)

    def test_powerlaw_synth_is_skewed_deterministic_and_split_exact(self, spark):
        """src_skew='powerlaw' plants a genuine out-degree hot spot (the
        top source owns >3% of edges at alpha=6), the table is identical
        at any requested parallelism, and the hub-split PageRank stays
        1e-12-equal to the unsplit plan on it — the small-scale twin of
        the 50M-edge headroom run in BENCH/BASELINE.md."""
        from rad_ecg_spark.operators.pagerank import pagerank
        from rad_ecg_spark.sources.synth_graph import synth_edges

        n_edges = 200_000
        e4 = synth_edges(spark, n_edges, partitions=4, src_skew="powerlaw")
        e16 = synth_edges(spark, n_edges, partitions=16, src_skew="powerlaw")
        assert e4.exceptAll(e16).count() == 0 and e16.exceptAll(e4).count() == 0

        top = (
            e4.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .orderBy(F.desc("d"))
            .limit(1)
            .collect()[0]
        )
        n_actual = e4.count()
        assert top["d"] / n_actual > 0.03, "powerlaw mode must plant a hot source"

        base = {
            r["id"]: r["rank"] for r in pagerank(e4, tol=0.0, max_iter=3).collect()
        }
        split = {
            r["id"]: r["rank"]
            for r in pagerank(
                e4, tol=0.0, max_iter=3, hub_degree_threshold=500
            ).collect()
        }
        assert base.keys() == split.keys()
        assert all(abs(base[k] - split[k]) < 1e-12 for k in base)

    def test_labelprop_hub_split_is_bitwise_identical(self, spark):
        """LP's supernode split must be BITWISE identical to the unsplit
        plan (messages are exact (dst, label) rows into an integer
        count — no float reordering), including per-round change
        counts."""
        from rad_ecg_spark.operators.labelprop import (
            LabelPropStats,
            label_propagation,
        )
        from rad_ecg_spark.sources.synth_graph import synth_edges

        e = synth_edges(spark, 100_000, partitions=4, src_skew="powerlaw")
        s1, s2 = LabelPropStats(), LabelPropStats()
        base = label_propagation(e, max_iter=4, stats=s1)
        split = label_propagation(
            e, max_iter=4, stats=s2, hub_degree_threshold=500
        )
        d = base.withColumnRenamed("label", "l2").join(split, "id")
        assert d.count() == base.count()
        assert d.filter(F.col("label") != F.col("l2")).count() == 0
        assert s1.changes == s2.changes

    def test_salted_join_matches_plain_join(self, spark):
        from rad_ecg_spark.operators.skew import salted_join

        big = spark.range(0, 10_000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v")
        )
        small = spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "k long, tag string"
        )
        got = salted_join(big, small, "k", n_salts=8)
        exp = big.join(small, "k")
        assert got.count() == exp.count() == 10_000
        assert got.groupBy("tag").count().orderBy("tag").collect() == (
            exp.groupBy("tag").count().orderBy("tag").collect()
        )


class TestPartwiseCheckpoint:
    def test_partial_rerun_writes_only_missing(self, spark, tmp_path):
        from rad_ecg_spark.plans.partwise import write_state_partwise

        df = spark.range(0, 1000, 1, 4).select("id", (F.col("id") * 2).alias("rank"))
        out = str(tmp_path / "iter1")
        st1 = write_state_partwise(df, out)
        assert sorted(s["pid"] for s in st1) == [0, 1, 2, 3]
        assert all(not s["skipped"] for s in st1)
        files = sorted(os.listdir(out))
        assert len(files) == 4 and not any(".tmp" in f for f in files)

        # simulate a killed job: two partitions never landed
        os.remove(os.path.join(out, files[1]))
        os.remove(os.path.join(out, files[2]))
        st2 = write_state_partwise(df, out)
        assert sum(1 for s in st2 if s["skipped"]) == 2
        assert sum(1 for s in st2 if not s["skipped"]) == 2
        back = spark.read.parquet(out)
        assert back.count() == 1000
        assert back.agg(F.sum("rank")).collect()[0][0] == df.agg(F.sum("rank")).collect()[0][0]

    def test_pagerank_resume_with_partwise_manager(self, spark, tmp_path):
        from rad_ecg_spark.operators.pagerank import PageRankStats, pagerank
        from rad_ecg_spark.plans.partwise import PartwiseCheckpointManager

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
        )
        full = {
            r["id"]: r["rank"]
            for r in pagerank(edges, tol=0.0, max_iter=6).collect()
        }
        root = str(tmp_path / "ckpt")
        cp1 = PartwiseCheckpointManager(spark, root, "pr")
        pagerank(edges, tol=0.0, max_iter=3, checkpointer=cp1).count()
        assert cp1.last_complete() == 3
        cp2 = PartwiseCheckpointManager(spark, root, "pr")
        st = PageRankStats()
        resumed = {
            r["id"]: r["rank"]
            for r in pagerank(
                edges, tol=0.0, max_iter=6, checkpointer=cp2, resume=True, stats=st
            ).collect()
        }
        assert st.resumed_from == 3
        assert all(abs(full[k] - resumed[k]) < 1e-15 for k in full)


class TestCsvSource:
    def test_schema_first_permissive_quarantine(self, spark, tmp_path):
        from rad_ecg_spark.sources.csv_source import read_csv, split_corrupt

        p = tmp_path / "in.csv"
        p.write_text(
            "id,name,score\n"
            "1,alice,3.5\n"
            "2,bob,not_a_number\n"
            "3,carol,9.25\n"
        )
        df = read_csv(spark, str(p), "id long, name string, score double")
        clean, bad = split_corrupt(df)
        assert {r["id"] for r in clean.collect()} == {1, 3}
        assert bad.count() == 1
        assert "not_a_number" in bad.collect()[0]["raw_line"]


class TestSparkMLStage:
    def test_linear_regression_matches_closed_form_ols(self, spark):
        """spark.ml LinearRegression (no regularization) on y = 3x + 7
        + deterministic noise must recover the closed-form OLS slope."""
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import LinearRegression

        df = spark.range(0, 200).select(
            F.col("id").cast("double").alias("x"),
            (
                F.col("id") * 3.0
                + 7.0
                + (F.pmod(F.xxhash64("id"), F.lit(100)).cast("double") - 50.0) / 50.0
            ).alias("y"),
        )
        # closed form from exact sums
        s = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        ).collect()[0]
        slope = (s["n"] * s["sxy"] - s["sx"] * s["sy"]) / (
            s["n"] * s["sxx"] - s["sx"] * s["sx"]
        )
        assembled = VectorAssembler(inputCols=["x"], outputCol="features").transform(df)
        model = LinearRegression(
            featuresCol="features", labelCol="y", regParam=0.0
        ).fit(assembled)
        assert abs(model.coefficients[0] - slope) < 1e-6
        assert abs(model.coefficients[0] - 3.0) < 0.01


class TestMetadataScan:
    def test_footer_scan_counts_without_data_read(self, spark):
        from rad_ecg_spark.sources.metadata import column_stats, parquet_footer_scan

        meta = parquet_footer_scan(spark, "/root/testdata/sf0.001").collect()
        by_table = {os.path.basename(r["path"]): r["n_rows"]
                    for r in meta if "events" in r["path"] or "region" in r["path"]}
        # region is 5 rows at every SF; events sf0.001 is 1000
        assert by_table.get("region.parquet") == 5
        assert by_table.get("events.parquet") == 1000

        stats = column_stats(
            spark, "/root/testdata/sf0.001/region.parquet", "r_regionkey"
        ).collect()
        assert len(stats) >= 1
        assert stats[0]["vmin"] == "0" and stats[0]["vmax"] == "4"


class TestUpsertSink:
    def test_merge_upsert_latest_wins(self, spark, tmp_path):
        import datetime as dt

        from rad_ecg_spark.plans.upsert import merge_upsert

        tgt = str(tmp_path / "tbl")
        t = lambda k: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=k)  # noqa: E731
        base = spark.createDataFrame(
            [(1, t(0), 10.0), (2, t(0), 20.0)], "k long, ts timestamp, v double"
        )
        merge_upsert(spark, tgt, base, ["k"], "ts")
        upd = spark.createDataFrame(
            [
                (2, t(5), 99.0),   # newer -> replaces
                (1, t(0), 77.0),   # same ts duplicate -> update wins
                (3, t(1), 30.0),   # brand new key
            ],
            "k long, ts timestamp, v double",
        )
        merge_upsert(spark, tgt, upd, ["k"], "ts")
        got = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
        assert got == {1: 77.0, 2: 99.0, 3: 30.0}

        # stale late row must NOT regress the newer value
        late = spark.createDataFrame([(2, t(1), 5.0)], "k long, ts timestamp, v double")
        merge_upsert(spark, tgt, late, ["k"], "ts")
        got = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
        assert got[2] == 99.0

    def test_streaming_foreach_batch_upsert(self, spark, tmp_path):
        import datetime as dt
        import os as _os

        from rad_ecg_spark.plans.upsert import foreach_batch_upsert

        src = tmp_path / "src"
        src.mkdir()
        t0 = dt.datetime(2024, 1, 1)

        def mk(name, rows, mtime):
            df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
            p = str(src / name)
            df.coalesce(1).write.mode("overwrite").parquet(p)
            _os.utime(p, (mtime, mtime))
            for f in _os.listdir(p):
                _os.utime(_os.path.join(p, f), (mtime, mtime))

        mk("b0", [(1, t0, 1.0), (2, t0, 2.0)], 1000)
        mk("b1", [(2, t0 + dt.timedelta(minutes=1), 22.0), (3, t0, 3.0)], 2000)
        stream = (
            spark.readStream.schema("k long, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        tgt = str(tmp_path / "tbl")
        q = foreach_batch_upsert(
            stream, tgt, ["k"], "ts", checkpoint_dir=str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
        assert got == {1: 1.0, 2: 22.0, 3: 3.0}


class TestPartitionedSink:
    def test_dynamic_overwrite_replaces_only_written_partitions(self, spark, tmp_path):
        from rad_ecg_spark.sources.sinks import write_partitioned_table

        tbl = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 10)], "part string, v long"
        )
        write_partitioned_table(base, tbl, ["part"])
        # backfill ONLY partition 'a'; 'b' must survive
        fix = spark.createDataFrame([("a", 99)], "part string, v long")
        write_partitioned_table(fix, tbl, ["part"])
        got = {(r["part"], r["v"]) for r in spark.read.parquet(tbl).collect()}
        assert got == {("a", 99), ("b", 10)}


class TestSchemaEvolution:
    def test_merge_schema_defaults_and_derivations(self, spark, tmp_path):
        from rad_ecg_spark.sources.evolution import read_evolved

        tbl = str(tmp_path / "gen")
        # generation 1: no 'score', no 'grade'
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double") \
            .write.parquet(tbl + "/g1")
        # generation 2: adds 'score'
        spark.createDataFrame([(3, 30.0, 0.5)], "id long, v double, score double") \
            .write.parquet(tbl + "/g2")
        df = read_evolved(
            spark,
            tbl + "/*",
            defaults={"score": -1.0},
            derivations={"score2x": lambda d: F.col("score") * 2},
        )
        got = {r["id"]: (r["score"], r["score2x"]) for r in df.collect()}
        assert got == {1: (-1.0, -2.0), 2: (-1.0, -2.0), 3: (0.5, 1.0)}
        assert set(df.columns) == {"id", "v", "score", "score2x"}


class TestStreamingSlidingWindow:
    def test_streaming_sliding_matches_batch(self, spark, tmp_path):
        import os

        from rad_ecg_spark.streaming.events import (
            read_events_stream,
            run_to_memory,
            windowed_counts,
        )

        d = tmp_path / "ev_stream"
        d.mkdir()
        (d / "events.parquet").symlink_to("/root/testdata/sf0.001/events.parquet")
        stream = read_events_stream(spark, str(d))
        got = {
            (r["wstart_s"], r["event_type"]): (r["n"], r["sum_value_c"])
            for r in run_to_memory(
                windowed_counts(stream, slide="90 minutes"), "sw_test"
            ).collect()
        }
        batch = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .groupBy(
                F.window(F.col("ts").cast("timestamp"), "6 hours", "90 minutes").alias("w"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
            )
            .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n", "s")
        )
        exp = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
        assert got == exp


class TestBlockedKernelMemory:
    def test_50k_group_within_memory_cap(self):
        """A 50k-row group streams through the blocked NN pass within a
        fixed buffer cap (the old (m x m) layout would allocate ~20 GB
        here). tracemalloc tracks numpy allocations; bound is the
        documented threads * buffers footprint plus slack."""
        import tracemalloc

        import numpy as np
        import pandas as pd

        from rad_ecg_spark.operators import matrixprofile as mp

        rng = np.random.default_rng(123)
        n = 50_000
        pdf = pd.DataFrame(
            {
                "uid": np.full(n, 7, dtype=np.int64),
                "ts_ms": np.arange(n, dtype=np.int64) * 1000,
                "cents": rng.integers(0, 50000, n).astype(np.int64),
                "oid": np.arange(n, dtype=np.int64),
            }
        )
        old_cap = mp._MAX_BLOCK_ELEMS
        mp._MAX_BLOCK_ELEMS = 1_000_000  # 8 MB/buffer: tighter, faster bound
        try:
            tracemalloc.start()
            out = mp.mp_discord_kernel(pdf, 8, threads=4)
            _, peak = tracemalloc.get_traced_memory()
        finally:
            tracemalloc.stop()
            mp._MAX_BLOCK_ELEMS = old_cap
        assert len(out) == 1 and out["n_windows"].iloc[0] == 49_993
        assert peak < 400e6, f"peak {peak/1e6:.0f} MB exceeds 400 MB cap"

    def test_blocked_equals_full_matrix_bitwise(self):
        """Row-blocking (any block size, any thread count) never changes
        a double: each pair's d2 is its own k-ordered scalar chain."""
        import numpy as np

        from rad_ecg_spark.operators.matrixprofile import _blocked_nn, znorm_windows

        rng = np.random.default_rng(5)
        x = rng.integers(0, 9000, 3000).astype(np.int64)
        idx, z = znorm_windows(x, 8)
        base = _blocked_nn(idx, z, 8, max_block_elems=len(idx) * len(idx))
        for kwargs in (
            {"max_block_elems": 7 * len(idx)},
            {"max_block_elems": 20000, "threads": 5},
            {"max_block_elems": len(idx), "threads": 2},
        ):
            got = _blocked_nn(idx, z, 8, **kwargs)
            for a, b in zip(base, got):
                assert np.array_equal(a, b)


class TestSaltedJoinBalance:
    def test_hot_key_spreads_with_unique_col_salt(self, spark):
        """A single hot key whose non-key columns are FULL duplicates
        still fans out over all n_salts subtasks when ``unique_col``
        names a primary key: salt = xxhash64(uid) is deterministic
        (retry-safe — see skew.py docstring) yet per-row. max/median
        subtask input < 4x; the join result equals the plain join."""
        from rad_ecg_spark.operators.skew import salted_join

        n_salts = 16
        # 40k rows on one hot key (payload duplicated, uid unique) + tail
        big = spark.range(0, 40_000).select(
            F.lit(1).alias("k"), F.lit(7).alias("v"), F.col("id").alias("uid")
        ).unionAll(
            spark.range(0, 400).select(
                (F.col("id") % 50 + 2).alias("k"),
                F.col("id").alias("v"),
                (F.col("id") + 100_000).alias("uid"),
            )
        )
        salt = F.pmod(F.xxhash64(F.col("uid")), F.lit(n_salts))
        counts = sorted(
            r["c"]
            for r in big.filter(F.col("k") == 1)
            .withColumn("s", salt)
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        assert len(counts) == n_salts, "hot key must hit every salt"
        assert counts[-1] / counts[len(counts) // 2] < 4.0

        small = spark.range(1, 52).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("name")
        )
        got = (
            salted_join(big, small, "k", n_salts=n_salts, unique_col="uid")
            .groupBy("k", "name")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        )
        want = (
            big.join(small, "k")
            .groupBy("k", "name")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_default_salt_spreads_distinct_rows_and_is_deterministic(self, spark):
        """Without unique_col the salt hashes ALL big-side columns:
        distinct rows of a hot key spread (< 4x max/median), and the
        same input always lands in the same buckets (retry-safe)."""
        from rad_ecg_spark.operators.skew import salted_join

        n_salts = 8
        big = spark.range(0, 20_000).select(
            F.lit(1).alias("k"), F.col("id").alias("v")
        )
        small = spark.createDataFrame([(1, "hot")], "k long, name string")

        def bucket_counts():
            return sorted(
                r["c"]
                for r in big.withColumn(
                    "s", F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(n_salts))
                )
                .groupBy("s")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )

        c1, c2 = bucket_counts(), bucket_counts()
        assert c1 == c2, "default salt must be deterministic run-to-run"
        assert len(c1) == n_salts
        assert c1[-1] / c1[len(c1) // 2] < 4.0
        assert salted_join(big, small, "k", n_salts=n_salts).count() == 20_000


class TestPowerTransform:
    def test_general_lambda_matches_textbook_formula(self, spark):
        import numpy as np

        from rad_ecg_spark.functions.transforms import boxcox_udf, yeojohnson_udf

        xs = (-3.5, -1.0, 0.0, 0.2, 4.0)
        df = spark.createDataFrame([(float(x),) for x in xs], "x double")
        got = [r[0] for r in df.select(yeojohnson_udf(1.3)("x")).collect()]

        def ref(x, lam=1.3):
            if x >= 0:
                return ((x + 1) ** lam - 1) / lam
            return -(((1 - x) ** (2 - lam)) - 1) / (2 - lam)

        assert np.allclose(got, [ref(x) for x in xs])
        # box-cox: positive domain only, lam=0.5 -> 2(sqrt(x)-1)
        gb = [r[0] for r in df.select(boxcox_udf(0.5)("x")).collect()]
        assert gb[0] is None and gb[2] is None
        assert abs(gb[4] - 2.0) < 1e-12
