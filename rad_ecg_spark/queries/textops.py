"""Text-analysis / dedup / similarity queries over documents+embeddings,
with exact DuckDB oracles (see queries/__init__.py for the
float-determinism policy; hash arithmetic is md5-derived integers so
both engines compute identical signatures).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rad_ecg_spark.functions.textstats import (
    LANG_MARKERS,
    STOPWORDS_EN,
    fingerprint,
    lang_id,
    n_tokens,
    punct_count,
    quality_score,
    stopword_count,
)
from rad_ecg_spark.operators.dedup import (
    MERSENNE31,
    MINHASH_PARAMS,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
)
from rad_ecg_spark.operators.similarity import brute_force_topk

WORDS_SQL = "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), x -> x <> '')"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- doc stats: token counts, quality score, language ID ---------------

def q_doc_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        n_tokens(t).alias("n_tokens"),
        punct_count(t).alias("n_punct"),
        stopword_count(t).alias("n_stop"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
    )


def _doc_stats_sql() -> str:
    w = WORDS_SQL.format(c="text")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    marker_counts = {
        lg: f"len(list_filter({w}, x -> list_contains([{', '.join(repr(m) for m in ms)}], x)))"
        for lg, ms in LANG_MARKERS.items()
    }
    # tie-break = language code ascending (matches array_min struct order)
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    case = " ".join(f"WHEN c_{lg} = best THEN '{lg}'" for lg in langs)
    return f"""
WITH s AS (
  SELECT doc_id,
    CAST(len({w}) AS INT) AS n_tokens,
    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS n_punct,
    CAST(len(list_filter({w}, x -> list_contains([{stop_list}], x))) AS INT) AS n_stop,
    CAST(length(text) AS INT) AS n_chars,
    {", ".join(f"CAST({expr} AS INT) AS c_{lg}" for lg, expr in marker_counts.items())}
  FROM documents
), s2 AS (SELECT *, {best} AS best FROM s)
SELECT doc_id, n_tokens, n_punct, n_stop,
  CAST(least(25, CAST(floor(n_tokens * 25 / 40.0) AS INT))
     + least(25, CAST(floor(n_chars * 25 / 300.0) AS INT))
     + least(25, CAST(floor(n_stop * 25 / 5.0) AS INT))
     + least(25, CAST(floor(n_punct * 25 / 3.0) AS INT)) AS INT) AS quality,
  CASE WHEN best = 0 THEN 'und' {case} END AS lang_guess
FROM s2"""


# --- exact dedup summary ------------------------------------------------

def q_exact_dedup_summary(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(fingerprint(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
    )


ORACLE_EXACT_DEDUP = r"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS BIGINT) AS n_distinct
FROM documents"""


# --- n-gram (word) Jaccard near-dup pairs -------------------------------

JACCARD_NUM, JACCARD_DEN = 9, 10


def q_jaccard_neardup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return jaccard_pairs(
        d, threshold_num=JACCARD_NUM, threshold_den=JACCARD_DEN
    )


def _jaccard_sql() -> str:
    w = WORDS_SQL.format(c="text")
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({w})) AS w FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id
), inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
  FROM tok l JOIN tok r ON l.w = r.w AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b, inter, CAST(sa.sz + sb.sz - inter AS BIGINT) AS uni
FROM inter JOIN sizes sa ON inter.a = sa.doc_id
           JOIN sizes sb ON inter.b = sb.doc_id
WHERE inter * {JACCARD_DEN} >= {JACCARD_NUM} * (sa.sz + sb.sz - inter)"""


# --- MinHash signatures + LSH candidates --------------------------------

def q_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_t(spark, sf_dir, "documents"))


def _minhash_sig_sql() -> str:
    w = WORDS_SQL.format(c="text")
    h = (
        "CAST(CAST(concat('0x', substring(md5(w), 1, 15)) AS UBIGINT) "
        f"% {MERSENNE31} AS BIGINT)"
    )
    sigs = ", ".join(
        f"CAST(min(({a} * h + {b}) % {MERSENNE31}) AS BIGINT) AS sig_{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({w})) AS w FROM documents
), th AS (SELECT doc_id, {h} AS h FROM tok)
SELECT doc_id, {sigs} FROM th GROUP BY doc_id"""


def q_minhash_lsh_candidates(spark, sf_dir):
    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"), bands=4)


def _minhash_lsh_sql_union(bands: int = 4) -> str:
    k = len(MINHASH_PARAMS)
    rpb = k // bands
    sig_sql = _minhash_sig_sql()
    selects = []
    for b in range(bands):
        parts = ", ".join(f"CAST(sig_{b * rpb + r} AS VARCHAR)" for r in range(rpb))
        selects.append(
            f"SELECT doc_id AS id, {b} AS band_id, concat_ws('_', {parts}) AS band_key FROM sigs"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH sigs AS ({sig_sql.strip()}),
buckets AS (
{union}
)
SELECT DISTINCT l.id AS a, r.id AS b
FROM buckets l JOIN buckets r
  ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.id < r.id"""


# --- embedding centroid checksum (array processing, exact ints) ---------

def q_embedding_centroids(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "vec_id",
        "pos",
        F.round(F.col("x").cast("double") * 1e6).cast("long").alias("xe6"),
    )
    return ex.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        F.sum((F.col("pos") + 1) * F.col("xe6")).alias("checksum"),
    )


ORACLE_CENTROIDS = """
WITH ex AS (
  SELECT label, vec_id,
         unnest(range(len(embedding))) AS pos,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS xe6
  FROM embeddings
)
SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
       CAST(sum((pos + 1) * xe6) AS BIGINT) AS checksum
FROM ex GROUP BY label"""


# --- brute-force cosine top-k (exact ANN baseline) -----------------------

TOPK_K = 3
N_QUERY_VECS = 5


def q_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    r = brute_force_topk(e, q, k=TOPK_K)
    return r.select(
        "qid", "rk", "vid", F.round(F.col("cos") * 1e6).cast("long").alias("cos_e6")
    )


def _cosine_topk_sql(dim: int = 64) -> str:
    # explicit left-assoc sums reproduce Spark's sequential aggregate fold
    dot = " + ".join(
        f"CAST(q.embedding[{i}] AS DOUBLE) * v.embedding[{i}]" for i in range(1, dim + 1)
    )
    qn = " + ".join(
        f"CAST(q.embedding[{i}] AS DOUBLE) * q.embedding[{i}]" for i in range(1, dim + 1)
    )
    vn = " + ".join(
        f"CAST(v.embedding[{i}] AS DOUBLE) * v.embedding[{i}]" for i in range(1, dim + 1)
    )
    return f"""
WITH scored AS (
  SELECT q.vec_id AS qid, v.vec_id AS vid,
         ({dot}) / (sqrt({qn}) * sqrt({vn})) AS cos
  FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
), ranked AS (
  SELECT qid, vid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rk
  FROM scored
)
SELECT qid, CAST(rk AS INT) AS rk, vid,
       CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
FROM ranked WHERE rk <= {TOPK_K}"""


TEXT_QUERIES = {
    "doc_stats": q_doc_stats,
    "exact_dedup_summary": q_exact_dedup_summary,
    "jaccard_neardup": q_jaccard_neardup,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_candidates": q_minhash_lsh_candidates,
    "embedding_centroids": q_embedding_centroids,
    "cosine_topk": q_cosine_topk,
}

TEXT_ORACLES = {
    "doc_stats": _doc_stats_sql(),
    "exact_dedup_summary": ORACLE_EXACT_DEDUP,
    "jaccard_neardup": _jaccard_sql(),
    "minhash_signatures": _minhash_sig_sql(),
    "minhash_lsh_candidates": _minhash_lsh_sql_union(),
    "embedding_centroids": ORACLE_CENTROIDS,
    "cosine_topk": _cosine_topk_sql(),
}
