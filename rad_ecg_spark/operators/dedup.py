"""Deduplication family for web-scale corpora.

- exact: hash-groupBy on a content fingerprint (md5 of normalized text);
  keeps the min-id representative. One shuffle, partial-agg friendly.
- n-gram Jaccard: word-level set overlap over candidate pairs generated
  by a shared-token join (never a blind cross join).
- MinHash + LSH: k permutation-style hashes min-folded over tokens; the
  signature is split into bands; pairs sharing any band bucket become
  candidates — THE scale path for near-dup at 10^12 docs (candidate
  generation is an equi-join on (band_id, band_key), not O(n²)).
- SimHash: 64-bit sign-aggregated token-hash sketch via a vectorized
  pandas UDF; near-dups = small Hamming distance.
- embedding cosine: see operators/similarity.py.

All hash arithmetic is plain integer math on md5-derived values so the
DuckDB oracle can reproduce signatures bit-for-bit (policy: no engine-
private hash functions on the correctness path).

Reference capability donor: overlap dedup via set-intersection + rollback
(/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:1710-1731).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rad_ecg_spark.functions.textstats import fingerprint, words

MERSENNE31 = (1 << 31) - 1
# fixed public-style LCG parameters for the k minhash functions
MINHASH_PARAMS = [(2 * i + 1, 7919 * (i + 1)) for i in range(8)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per content fingerprint. Returns the kept rows
    plus group size (n_copies)."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def token_hash(col):
    """Word -> 60-bit int via md5 hex prefix (portable across engines),
    reduced mod 2^31-1 for overflow-free LCG arithmetic."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MERSENNE31


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min over tokens of (a*h + b) mod p."""
    tok = (
        df.select(id_col, F.explode(words(F.col(text_col))).alias("w"))
        .distinct()
        .withColumn("h", token_hash(F.col("w")))
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"sig_{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band.

    Scale shape: signatures -> unpivot to (band_id, band_key, id) ->
    self-join on the band bucket. Bucket sizes are bounded by hashing;
    a pathological mega-bucket would be the salting case — at web scale
    cap bucket size or add a secondary band hash.
    """
    k = len(MINHASH_PARAMS)
    rows_per_band = k // bands
    sigs = minhash_signatures(df, text_col, id_col)
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_id"), F.concat_ws("_", *parts).alias("band_key")
            )
        )
    buckets = sigs.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band_id").alias("band_id"), F.col("bk.band_key").alias("band_key"))
    l = buckets.select("band_id", "band_key", F.col("id").alias("a"))
    r = buckets.select("band_id", "band_key", F.col("id").alias("b"))
    return (
        l.join(r, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 8,
    threshold_den: int = 10,
) -> DataFrame:
    """Near-dup pairs by word-set Jaccard >= num/den, exact integer
    comparison (inter*den >= num*union). Candidates via shared-token
    equi-join (skew note: extremely common tokens fan out — at scale,
    drop top-frequency tokens from the candidate key first)."""
    tok = df.select(id_col, F.explode(words(F.col(text_col))).alias("w")).distinct()
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    l = tok.select(F.col(id_col).alias("a"), "w")
    r = tok.select(F.col(id_col).alias("b"), "w")
    inter = (
        l.join(r, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
        .filter(
            F.col("inter") * threshold_den >= F.lit(threshold_num) * F.col("uni")
        )
        .select("a", "b", "inter", "uni")
    )


_SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (Arrow-vectorized; numpy bit ops).

    Per doc: each token hashes to 64 bits (blake2b of the token, public
    stdlib); bit i votes +1/-1; sign of the vote sum forms the sketch.
    """
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        if not t:
            continue
        toks = [w for w in _simhash_split(t) if w]
        if not toks:
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                for w in set(toks)
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in range(_SIMHASH_BITS):
            if votes[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def _simhash_split(t: str) -> list[str]:
    import re

    return re.split(r"[^a-z0-9]+", t.lower())


def simhash_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Candidate
    generation by banding the 64-bit sketch into 4 x 16-bit chunks
    (pigeonhole: <=3 differing bits => at least one identical chunk)."""
    s = df.select(id_col, simhash64(F.col(text_col)).alias("sh"))
    chunks = [
        F.struct(
            F.lit(c).alias("cid"),
            F.shiftrightunsigned(F.col("sh"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
        )
        for c in range(4)
    ]
    buckets = s.select(
        F.col(id_col).alias("id"), "sh", F.explode(F.array(*chunks)).alias("c")
    ).select("id", "sh", F.col("c.cid").alias("cid"), F.col("c.ck").alias("ck"))
    l = buckets.select(F.col("id").alias("a"), F.col("sh").alias("sha"), "cid", "ck")
    r = buckets.select(F.col("id").alias("b"), F.col("sh").alias("shb"), "cid", "ck")
    return (
        l.join(r, ["cid", "ck"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sha", "shb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
