"""End-to-end pipeline composition: extraction -> dedup -> link rewrite
-> graph analytics. Planted mirrors must collapse to one vertex and the
outputs must land on disk with a consistent summary."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rad_ecg_spark.functions.extract import pages_to_edges
from rad_ecg_spark.plans.pipeline import build_graph, dedup_pages, run_pipeline
from rad_ecg_spark.sources.pages import generate_pages


def _pages_with_mirrors(spark, n_sites=6, per_site=10):
    """Generated corpus + a full mirror of site 0 under mirror.example
    (identical html/text, different urls) — the classic crawl-dup case."""
    pages = generate_pages(spark, n_sites, per_site)
    mirror = pages.filter(F.col("url").contains("site0000")).withColumn(
        "url", F.regexp_replace("url", r"site0000\.example", "mirror0000.example")
    )
    return pages.unionByName(mirror), pages


class TestDedupPages:
    def test_mirrors_collapse_to_original(self, spark):
        both, orig = _pages_with_mirrors(spark)
        kept, rep_map = dedup_pages(both)
        n_orig = orig.count()
        # every mirror url maps to the original (min-url rule: 'mirror...'
        # sorts after 'site...' only if... assert by fingerprint equality
        # instead: kept count equals the original corpus count)
        assert kept.count() == n_orig
        assert rep_map.count() == both.count()
        # every mirror url shares its representative with the original
        # page it mirrors (min-url rule makes the rep deterministic)
        m = rep_map.filter(F.col("url").contains("mirror0000")).select(
            F.regexp_replace(
                "url", r"mirror0000\.example", "site0000.example"
            ).alias("ourl"),
            F.col("rep").alias("mrep"),
        )
        o = rep_map.select(F.col("url").alias("ourl"), F.col("rep").alias("orep"))
        j = m.join(o, "ourl")
        assert j.count() > 0, "mirror urls must appear in the map"
        assert j.filter(F.col("mrep") != F.col("orep")).count() == 0

    def test_rewritten_graph_merges_mirror_vertices(self, spark):
        both, orig = _pages_with_mirrors(spark)
        kept, rep_map = dedup_pages(both)
        edges = build_graph(both, rep_map)
        # no vertex from a collapsed mirror pair appears twice: every
        # endpoint must be its own representative
        eps = (
            edges.select(F.col("src").alias("u"))
            .unionByName(edges.select(F.col("dst").alias("u")))
            .distinct()
        )
        non_rep = eps.join(
            rep_map.filter(F.col("url") != F.col("rep")).select(
                F.col("url").alias("u")
            ),
            "u",
        )
        assert non_rep.count() == 0
        # and the deduped graph is no bigger than the raw original graph
        raw = (
            pages_to_edges(orig, dedupe=True)
            .filter(F.col("src_url") != F.col("dst_url"))
            .count()
        )
        assert edges.count() <= raw


class TestRunPipeline:
    def test_full_run_writes_outputs_and_summary(self, spark, tmp_path):
        both, orig = _pages_with_mirrors(spark, n_sites=4, per_site=8)
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        summary = run_pipeline(
            spark,
            both,
            out,
            checkpoint_dir=ck,
            max_iter=12,
            verify_extract=True,
        )
        assert summary["extract_violations"] == 0
        assert summary["kept_after_dedup"] == orig.count()
        assert summary["edges"] > 0
        assert summary["pagerank"]["vertices"] > 0
        assert summary["components"] >= 1
        assert summary["triangles"] >= 0
        for name in ("rep_map", "pagerank", "components", "labels"):
            assert os.path.isdir(os.path.join(out, name)), name
        on_disk = json.load(open(os.path.join(out, "summary.json")))
        assert on_disk == summary
        # the durable checkpoint landed (resumable run)
        from rad_ecg_spark.plans.checkpoint import CheckpointManager

        cm = CheckpointManager(spark, ck, "pagerank")
        assert cm.last_complete() == summary["pagerank"]["iterations"]

    def test_rank_mass_conserved_on_deduped_graph(self, spark, tmp_path):
        both, _ = _pages_with_mirrors(spark, n_sites=3, per_site=6)
        out = str(tmp_path / "out2")
        run_pipeline(spark, both, out, algos=("pagerank",), max_iter=8)
        ranks = spark.read.parquet(os.path.join(out, "pagerank"))
        mass = ranks.agg(F.sum("rank")).collect()[0][0]
        assert abs(mass - 1.0) < 1e-9


class TestPipelineRound5:
    def test_null_text_pages_stay_in_rep_map(self, spark):
        """A NULL-text page must not fall out of rep_map (null fp !=
        null fp would drop it from every equi-join); NULL collapses
        with empty text by design."""
        from pyspark.sql import types as T

        pages = generate_pages(spark, 2, 5)
        extra = spark.createDataFrame(
            [
                ("https://nulltext.example/a", None, None, None, "en"),
                ("https://nulltext.example/b", None, None, "", "en"),
            ],
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("warc_ts", T.TimestampType()),
                    T.StructField("html", T.BinaryType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        )
        both = pages.unionByName(extra)
        kept, rep_map = dedup_pages(both)
        assert rep_map.count() == both.count()
        covered = {
            r["url"]
            for r in rep_map.filter(
                F.col("url").contains("nulltext")
            ).collect()
        }
        assert covered == {
            "https://nulltext.example/a",
            "https://nulltext.example/b",
        }
        # NULL text and empty text share one representative (documented)
        reps = {
            r["rep"]
            for r in rep_map.filter(F.col("url").contains("nulltext")).collect()
        }
        assert len(reps) == 1

    def test_summary_reports_stage_walls_and_lp_convergence(self, spark, tmp_path):
        both, _ = _pages_with_mirrors(spark, n_sites=3, per_site=6)
        out = str(tmp_path / "out5")
        summary = run_pipeline(spark, both, out, max_iter=12)
        walls = summary["stage_wall_s"]
        for stage in (
            "dedup", "extract_build_graph", "pagerank", "components",
            "labelprop", "triangles", "total",
        ):
            assert walls[stage] >= 0.0, stage
        assert summary["labelprop"]["iterations"] >= 1
        assert isinstance(summary["labelprop"]["converged"], bool)
        assert summary["pagerank"]["resumed_from"] is None

    def test_hub_threshold_and_tol_mode_flow_through(self, spark, tmp_path):
        """The supernode split and the rel convergence criterion are
        reachable from the composed pipeline (power-law web graphs are
        the pipeline's target domain): identical ranks/labels with and
        without the hub split, and rel mode converges like the
        operator-level contract says."""
        both, _ = _pages_with_mirrors(spark, n_sites=4, per_site=8)
        plain_out = str(tmp_path / "plain")
        split_out = str(tmp_path / "split")
        s_plain = run_pipeline(
            spark, both, plain_out, algos=("pagerank", "labelprop"),
            max_iter=15, tol_mode="rel",
        )
        s_split = run_pipeline(
            spark, both, split_out, algos=("pagerank", "labelprop"),
            max_iter=15, tol_mode="rel", hub_degree_threshold=3,
        )
        # same criterion, same graph: identical iteration trajectories
        assert s_split["pagerank"]["iterations"] == s_plain["pagerank"]["iterations"]
        assert s_split["labels"] == s_plain["labels"]
        a = spark.read.parquet(os.path.join(plain_out, "pagerank"))
        b = spark.read.parquet(os.path.join(split_out, "pagerank")).select(
            F.col("id").alias("bid"), F.col("rank").alias("brank")
        )
        diff = (
            a.join(b, a.id == F.col("bid"))
            .select(F.max(F.abs(F.col("rank") - F.col("brank"))).alias("d"))
            .collect()[0]["d"]
        )
        # float-summation reordering only (operators/pagerank.py contract)
        assert diff < 1e-12
        la = spark.read.parquet(os.path.join(plain_out, "labels"))
        lb = spark.read.parquet(os.path.join(split_out, "labels")).select(
            F.col("id").alias("bid"), F.col("label").alias("blabel")
        )
        assert (
            la.join(lb, la.id == F.col("bid"))
            .filter(F.col("label") != F.col("blabel"))
            .count()
            == 0
        )
