"""End-to-end web corpus pipeline — the north-star narrative as ONE
composable artifact:

    pages(url, warc_ts, html, text, lang)
      -> byte-exact text + outlink extraction (Arrow UDFs)
      -> corpus dedup: exact (fingerprint) + near-dup clusters
         (MinHash-LSH candidates -> exact Jaccard verify -> connected
         components -> min-id representative)
      -> link rewrite: every url (src AND dst) maps to its dup-cluster
         representative, so mirror pages merge into one vertex instead
         of splitting rank mass
      -> link-graph analytics on the deduped graph: PageRank (durable,
         resumable checkpoints), connected components, label
         propagation, triangle count
      -> per-stage parquet outputs + a machine-readable run summary.

Every stage is the same operator the registry queries exercise (so the
pipeline is covered by the same oracles); this module only composes
them. Scale shape: the dedup candidate joins are banded (never O(n²)),
the rewrite joins broadcast the rep map when small, and the iterative
stages keep their one-exchange-per-round discipline.

Reference capability donor: the reference's end-to-end run script shape
(/root/reference/src/rad_ecg/scripts/peak_detect_v4.py main flow:
load -> clean/dedup -> per-section analytics -> checkpointed outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_pages(
    pages: DataFrame,
    jaccard_num: int = 9,
    jaccard_den: int = 10,
    lsh_bands: int = 4,
    max_bucket: int | None = 1_000,
) -> tuple[DataFrame, DataFrame]:
    """(kept_pages, rep_map): collapse exact and near duplicates.

    rep_map(url, rep) covers EVERY input url (identity rows included),
    so consumers can unconditionally join through it. kept_pages are
    the representative rows only.

    ``max_bucket`` (LSH mega-bucket cap) defaults to 1000 here — an
    UNCAPPED-ish 10k ceiling melts on boilerplate-heavy corpora:
    measured on the 100k-page synthetic crawl (34-word template
    vocabulary), band buckets reach 13k docs and a 10k cap still
    keeps ~486M candidate pairs with single join tasks carrying
    |bucket|^2/2 ≈ 3e7 pairs (one core pegged for over an hour); at
    1000 the kept candidate set is a few million pairs and the
    per-task bound is 500k. A bucket that big means the band key is
    boilerplate, i.e. uninformative — dropping it improves precision,
    exact mirrors are already collapsed by the fingerprint stage, and
    true near-dups keep their other ``lsh_bands - 1`` chances.
    """
    from rad_ecg_spark.functions.textstats import fingerprint
    from rad_ecg_spark.operators.dedup import dup_clusters

    # exact stage first: identical fingerprints collapse to the min url
    # (exact_dedup's rule) before the more expensive near-dup machinery
    # sees the corpus. groupBy(fp) gets map-side partial aggregation, so
    # a mega-cluster of identical boilerplate reduces before the shuffle.
    # NULL text is fingerprinted as empty text: fingerprint(NULL) is
    # NULL, and a NULL fp would fall out of the equi-joins below (null
    # != null), silently dropping the page from rep_map and breaking
    # the every-url contract. Collapsing NULL with '' is deliberate —
    # both carry zero extractable text, and the near-dup stage already
    # treats them identically (no tokens).
    with_fp = pages.select(
        "url", fingerprint(F.coalesce(F.col("text"), F.lit(""))).alias("fp")
    )
    exact_reps = with_fp.groupBy("fp").agg(F.min("url").alias("exact_rep"))
    exact_map = with_fp.join(exact_reps, "fp").select("url", "exact_rep")
    exact_kept = pages.join(
        exact_map.filter(F.col("url") == F.col("exact_rep")).select("url"), "url"
    )

    # near-dup clusters over the exact-deduped corpus
    clusters = dup_clusters(
        exact_kept,
        bands=lsh_bands,
        threshold_num=jaccard_num,
        threshold_den=jaccard_den,
        max_bucket=max_bucket,
        text_col="text",
        id_col="url",
    ).select(F.col("url").alias("curl"), F.col("rep").alias("near_rep"))

    near_map = exact_kept.select("url").join(
        clusters, F.col("url") == F.col("curl"), "left"
    ).select(
        "url", F.coalesce(F.col("near_rep"), F.col("url")).alias("near_rep")
    )
    # full map: url -> exact rep -> near rep
    rep_map = (
        exact_map.join(
            near_map.select(F.col("url").alias("erurl"), "near_rep"),
            F.col("exact_rep") == F.col("erurl"),
        )
        .select("url", F.col("near_rep").alias("rep"))
    )
    kept = pages.join(
        rep_map.filter(F.col("url") == F.col("rep")).select("url"), "url"
    )
    return kept, rep_map


def build_graph(pages: DataFrame, rep_map: DataFrame) -> DataFrame:
    """Deduped link graph: outlinks of ALL pages with both endpoints
    rewritten to cluster representatives; self-loops (mirror links
    inside one cluster) and duplicate edges drop out."""
    from rad_ecg_spark.functions.extract import pages_to_edges

    edges = pages_to_edges(pages, dedupe=False).withColumnsRenamed(
        {"src_url": "src", "dst_url": "dst"}
    )
    src_map = rep_map.select(F.col("url").alias("src"), F.col("rep").alias("src_rep"))
    dst_map = rep_map.select(F.col("url").alias("dst"), F.col("rep").alias("dst_rep"))
    return (
        edges.join(src_map, "src")
        # left: a link to an URL outside the crawl keeps its target as-is
        .join(dst_map, "dst", "left")
        .select(
            F.col("src_rep").alias("src"),
            F.coalesce(F.col("dst_rep"), F.col("dst")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    algos: tuple[str, ...] = ("pagerank", "components", "labelprop", "triangles"),
    checkpoint_dir: str | None = None,
    resume: bool = False,
    tol: float = 1e-6,
    max_iter: int = 100,
    verify_extract: bool = False,
    hub_degree_threshold: int | None = None,
    tol_mode: str = "abs",
) -> dict:
    """Run the full pipeline; returns a summary dict (also written to
    ``<out_dir>/summary.json``). ``summary["stage_wall_s"]`` carries
    per-stage wall-clock so a bench-scale run is self-reporting.

    ``hub_degree_threshold``: real web graphs are power-law — when set,
    PageRank and label propagation route supernode hubs through the
    broadcast path (operators/skew.py; ~2x/iteration at extreme
    out-degree skew, BENCH/BASELINE.md 'Hub-split supernode path').
    ``tol_mode``: "abs" or "rel" PageRank convergence criterion
    (operators/pagerank.py — "rel" is the scale-invariant form)."""
    import json
    import os
    import time

    from rad_ecg_spark.functions.extract import text_invariant_violations

    summary: dict = {}
    walls: dict[str, float] = {}
    t_total = time.monotonic()

    def _stage(name: str, t0: float) -> None:
        walls[name] = round(time.monotonic() - t0, 3)

    if verify_extract:
        t0 = time.monotonic()
        bad = text_invariant_violations(pages).count()
        summary["extract_violations"] = bad
        _stage("verify_extract", t0)
        if bad:
            raise RuntimeError(f"{bad} pages fail the byte-exact text invariant")

    t0 = time.monotonic()
    n_pages = pages.count()
    kept, rep_map = dedup_pages(pages)
    kept = kept.persist()
    rep_map = rep_map.persist()
    n_kept = kept.count()
    summary.update({"pages": n_pages, "kept_after_dedup": n_kept})
    rep_map.write.mode("overwrite").parquet(os.path.join(out_dir, "rep_map"))
    _stage("dedup", t0)

    t0 = time.monotonic()
    edges = build_graph(pages, rep_map).persist()
    summary["edges"] = edges.count()
    _stage("extract_build_graph", t0)

    if "pagerank" in algos:
        from rad_ecg_spark.operators.pagerank import PageRankStats, pagerank
        from rad_ecg_spark.plans.checkpoint import CheckpointManager

        t0 = time.monotonic()
        ck = (
            CheckpointManager(spark, checkpoint_dir, "pagerank", async_write=True)
            if checkpoint_dir
            else None
        )
        try:
            st = PageRankStats()
            ranks = pagerank(
                edges, tol=tol, tol_mode=tol_mode, max_iter=max_iter,
                checkpointer=ck, resume=resume, stats=st,
                hub_degree_threshold=hub_degree_threshold,
            )
            ranks.write.mode("overwrite").parquet(os.path.join(out_dir, "pagerank"))
        finally:
            if ck is not None:
                # drain an in-flight async commit, even on error — but
                # never let a failed drain REPLACE an exception already
                # propagating from pagerank() (ADVICE r05: the close()
                # re-raise would mask the original error)
                import sys as _sys

                # must be read BEFORE the try: inside the except block
                # exc_info() would report close()'s own error
                propagating = _sys.exc_info()[0] is not None
                try:
                    ck.close()
                except Exception:
                    if not propagating:
                        raise
        summary["pagerank"] = {
            "iterations": st.iterations,
            "converged": st.converged,
            "vertices": st.num_vertices,
            "resumed_from": st.resumed_from,
        }
        _stage("pagerank", t0)
    if "components" in algos:
        from rad_ecg_spark.operators.components import connected_components

        t0 = time.monotonic()
        cc = connected_components(edges, method="hybrid")
        cc.write.mode("overwrite").parquet(os.path.join(out_dir, "components"))
        summary["components"] = cc.select("component").distinct().count()
        _stage("components", t0)
    if "labelprop" in algos:
        from rad_ecg_spark.operators.labelprop import LabelPropStats, label_propagation

        t0 = time.monotonic()
        lst = LabelPropStats()
        lp = label_propagation(
            edges, max_iter=min(max_iter, 30), stats=lst,
            hub_degree_threshold=hub_degree_threshold,
        )
        lp.write.mode("overwrite").parquet(os.path.join(out_dir, "labels"))
        # a capped, non-converged LP run must be visible in the summary,
        # not silently reported like a converged one
        summary["labels"] = lp.select("label").distinct().count()
        summary["labelprop"] = {
            "iterations": lst.iterations,
            "converged": lst.converged,
        }
        _stage("labelprop", t0)
    if "triangles" in algos:
        from rad_ecg_spark.operators.triangles import triangle_count

        t0 = time.monotonic()
        summary["triangles"] = triangle_count(edges)
        _stage("triangles", t0)

    kept.unpersist()
    rep_map.unpersist()
    edges.unpersist()
    walls["total"] = round(time.monotonic() - t_total, 3)
    summary["stage_wall_s"] = walls
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
