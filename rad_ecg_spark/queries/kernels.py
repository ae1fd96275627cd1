"""Pandas-kernel query family: grouped-map UDTF (group -> N rows) and
the Series->Struct statistical metric bundle, both with exact DuckDB
oracles (integer-sum policy, queries/__init__.py).
"""

from __future__ import annotations

from rad_ecg_spark.functions.statkernel import bundle_oracle_sql, stat_bundle
from rad_ecg_spark.operators.episodes import detect_episodes, episodes_oracle_sql


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- grouped-map UDTF: per-user episode extraction ----------------------
# ref shape: per-section beat UDTF, peak_detect_v4.py:1407-1567

def q_episodes(spark, sf_dir):
    return detect_episodes(_t(spark, sf_dir, "events"), threshold=250.0)


# --- Series->Struct statistical kernel bundle ---------------------------
# ref shape: SQI metric bundle + gate, peak_detect_v4.py:132-233

def q_stat_bundle(spark, sf_dir):
    return stat_bundle(_t(spark, sf_dir, "events"))


# --- matrix-profile discord per user ------------------------------------
# ref: stumpy discord search, ml/anomaly/stump_anom.py:60-110

def q_matrix_profile(spark, sf_dir):
    from rad_ecg_spark.operators.matrixprofile import matrix_profile_discord

    return matrix_profile_discord(_t(spark, sf_dir, "events"), w=8)


def _mp_oracle():
    from rad_ecg_spark.operators.matrixprofile import matrix_profile_oracle_sql

    return matrix_profile_oracle_sql(w=8)


# --- FLUSS regime segmentation per user ---------------------------------
# ref: FLUSS segmentation, porcine/stumpy_fluss_phase_angle.py

def q_fluss(spark, sf_dir):
    from rad_ecg_spark.operators.matrixprofile import fluss_regime

    return fluss_regime(_t(spark, sf_dir, "events"), w=8)


def _fluss_oracle():
    from rad_ecg_spark.operators.matrixprofile import fluss_oracle_sql

    return fluss_oracle_sql(w=8)


# --- chunk-with-halo kernels over ONE giant ordered series ----------------
# ref: single-signal rolling median utils.py:54-76; per-section MP over one
# signal porcine/stumpy_discord.py:310-470

def q_halo_rolling_median(spark, sf_dir):
    from rad_ecg_spark.operators.halo import halo_rolling_median

    return halo_rolling_median(_t(spark, sf_dir, "events"), h=3, chunk_rows=512)


def q_halo_mp(spark, sf_dir):
    from rad_ecg_spark.operators.halo import halo_mp_discord

    return halo_mp_discord(_t(spark, sf_dir, "events"), w=8, chunk_rows=512)


def _halo_median_oracle():
    from rad_ecg_spark.operators.halo import halo_rolling_median_oracle_sql

    return halo_rolling_median_oracle_sql(h=3)


def _halo_mp_oracle():
    from rad_ecg_spark.operators.halo import halo_mp_oracle_sql

    return halo_mp_oracle_sql(w=8, chunk_rows=512)


# --- multimodal codec path: BMP round-trip -> integer luma strips ---------
# ref shape: binary block decode, lib_ebm/pyebmreader.py:68-181

BMP_IDS, BMP_H, BMP_W, BMP_STRIPS = 48, 8, 16, 8


def q_image_luma(spark, sf_dir):
    from rad_ecg_spark.functions.multimodal import image_luma_profile, synth_event_bmp

    media = synth_event_bmp(
        _t(spark, sf_dir, "events"), n_ids=BMP_IDS, h=BMP_H, w=BMP_W
    )
    return image_luma_profile(media, n_strips=BMP_STRIPS)


# np.array_split over BMP_W=16 columns into 8 strips -> strip = c // 2;
# the pixel formulas mirror synth_event_bmp verbatim (all exact ints)
IMAGE_LUMA_ORACLE = f"""
WITH ids AS (
  SELECT DISTINCT event_id AS mid FROM events WHERE event_id < {BMP_IDS}
), px AS (
  SELECT mid, r.r AS r, c.c AS c,
         (mid * 7 + r.r * 13 + c.c * 31) % 256 AS red,
         (mid * 11 + r.r * 17 + c.c * 3) % 256 AS grn,
         (mid * 5 + r.r * 29 + c.c * 23) % 256 AS blu
  FROM ids,
       (SELECT unnest(range({BMP_H})) AS r) r,
       (SELECT unnest(range({BMP_W})) AS c) c
)
SELECT mid AS media_id, CAST(c // {BMP_W // BMP_STRIPS} AS INT) AS strip,
       CAST(sum(299 * red + 587 * grn + 114 * blu) AS BIGINT) AS luma_sum_e3
FROM px GROUP BY 1, 2"""


# --- video frame-sampling decode (real Y4M codec) --------------------------
# Same design as image_luma_profile: a deterministic closed-form pixel
# fixture keyed off events round-trips through the REAL dependency-free
# Y4M (YUV4MPEG2 Cmono) encoder/decoder on the Spark side, while the
# oracle reproduces the decoded planes arithmetically — the codec and the
# frame-sampling fan-out are both under the value-hash check.

Y4M_IDS, Y4M_FRAMES, Y4M_H, Y4M_W, Y4M_EVERY = 24, 12, 6, 8, 5


def q_video_frame_luma(spark, sf_dir):
    from rad_ecg_spark.functions.multimodal import synth_event_y4m, video_frame_luma

    media = synth_event_y4m(
        _t(spark, sf_dir, "events"),
        n_ids=Y4M_IDS, n_frames=Y4M_FRAMES, h=Y4M_H, w=Y4M_W,
    )
    return video_frame_luma(media, every_n=Y4M_EVERY)


VIDEO_LUMA_ORACLE = f"""
WITH ids AS (
  SELECT DISTINCT event_id AS mid FROM events WHERE event_id < {Y4M_IDS}
), px AS (
  SELECT mid, f.f AS f, r.r AS r, c.c AS c,
         (mid * 7 + f.f * 41 + r.r * 13 + c.c * 31) % 256 AS y
  FROM ids,
       (SELECT unnest(range(0, {Y4M_FRAMES}, {Y4M_EVERY})) AS f) f,
       (SELECT unnest(range({Y4M_H})) AS r) r,
       (SELECT unnest(range({Y4M_W})) AS c) c
)
SELECT mid AS media_id, CAST(f AS INT) AS frame_idx,
       CAST(sum(y) AS BIGINT) AS luma_sum
FROM px GROUP BY 1, 2"""


# --- power transform (Yeo-Johnson pandas UDF) ------------------------------
# ref: PowerTransformer stage, ml/anomaly/ml_anom.py:798-821

def q_power_transform(spark, sf_dir):
    from rad_ecg_spark.functions.transforms import power_transform_query

    return power_transform_query(_t(spark, sf_dir, "events"), lam=0.5)


def _power_oracle():
    from rad_ecg_spark.functions.transforms import POWER_TRANSFORM_ORACLE

    return POWER_TRANSFORM_ORACLE


KERNEL_QUERIES = {
    "episodes_udtf": q_episodes,
    "stat_bundle": q_stat_bundle,
    "matrix_profile_discord": q_matrix_profile,
    "fluss_regime": q_fluss,
    "halo_rolling_median": q_halo_rolling_median,
    "halo_mp_discord": q_halo_mp,
    "image_luma_profile": q_image_luma,
    "video_frame_luma": q_video_frame_luma,
    "power_transform": q_power_transform,
}

KERNEL_ORACLES = {
    "episodes_udtf": episodes_oracle_sql(threshold=250.0),
    "stat_bundle": bundle_oracle_sql(),
    "matrix_profile_discord": _mp_oracle(),
    "fluss_regime": _fluss_oracle(),
    "halo_rolling_median": _halo_median_oracle(),
    "halo_mp_discord": _halo_mp_oracle(),
    "image_luma_profile": IMAGE_LUMA_ORACLE,
    "video_frame_luma": VIDEO_LUMA_ORACLE,
    "power_transform": _power_oracle(),
}
