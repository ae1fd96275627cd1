"""Streaming semantics + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rad_ecg_spark.functions.multimodal import (
    extract_image_features,
    frame_sample_plan,
    synth_media,
)
from rad_ecg_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    # file stream sources watch a DIRECTORY; expose the single parquet
    # file through a symlinked dir
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    return str(d)


class TestStreaming:
    def test_windowed_counts_match_batch(self, spark, events_stream_dir):
        stream = read_events_stream(spark, events_stream_dir)
        got = {
            (r["wstart_s"], r["event_type"]): (r["n"], r["sum_value_c"])
            for r in run_to_memory(windowed_counts(stream), "wc_test").collect()
        }
        batch = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .groupBy(F.window(F.col("ts").cast("timestamp"), "6 hours").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
            )
            .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n", "s")
        )
        exp = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
        assert got == exp

    def test_dedup_within_watermark(self, spark, events_stream_dir):
        stream = read_events_stream(spark, events_stream_dir)
        n = run_to_memory(dedup_within_watermark(stream), "dd_test").count()
        exp = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert n == exp  # no duplicate event_ids in the source


class TestMultimodal:
    def test_feature_extraction_deterministic(self, spark):
        media = synth_media(spark, 50)
        feats = extract_image_features(media).orderBy("media_id").collect()
        assert len(feats) == 50
        assert all(len(r["feat"]) == 8 for r in feats)
        assert all(r["decode_ok"] for r in feats)
        again = extract_image_features(synth_media(spark, 50)).orderBy("media_id").collect()
        assert [r["feat"] for r in feats] == [r["feat"] for r in again]

    def test_real_backend_is_explicit_stub(self, spark):
        media = synth_media(spark, 5)
        with pytest.raises(Exception, match="NotImplementedError|decode backend"):
            extract_image_features(media, decode_backend="pil").collect()

    def test_frame_sample_plan(self, spark):
        media = synth_media(spark, 10, kind="video")
        # n_frames=1 in synth meta -> one frame 0 per video
        plan = frame_sample_plan(media, every_n=5).collect()
        assert {r["frame_idx"] for r in plan} == {0}
        assert len(plan) == 10
