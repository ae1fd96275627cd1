"""Supernode hub-split measurement at scale-headroom size (VERDICT r4
"Missing #3"): PageRank on a power-law OUT-degree graph, with and
without ``hub_degree_threshold`` — walls AND a rank-equality check.

Protocol (BENCH/BASELINE.md conventions + memory/scaling notes):
- graph: synth_edges(src_skew="powerlaw", alpha=6) — top source owns
  ~7% of all edges, ~200 hubs clear the 8192 threshold, the straggler
  shape the split exists for;
- timing: fresh JVM per run (subprocess), INTERLEAVED unsplit/split
  pairs so a co-tenant noise burst hits both variants symmetrically;
  per-run steady = median of last-half iterations, floor = best
  iteration; never two Spark sessions concurrently;
- equality: ONE extra session computes both variants and joins the
  rank vectors — the split reorders float summation (union + partial
  aggregation tree), so agreement is ~1e-12, not bitwise
  (operators/pagerank.py docstring contract).

Usage: python tools/bench_hub_split.py [n_edges] [cpus] [pairs] [threshold] [alpha]
Prints one RESULT json line per timing run + one EQUALITY line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMING_RUNNER = r"""
import json, sys, time
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges
from rad_ecg_spark.operators.pagerank import PageRankStats, pagerank

variant, cpus, n_edges, threshold = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
alpha = float(sys.argv[5])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges, partitions=cpus, src_skew="powerlaw",
                    powerlaw_alpha=alpha)
edges.count()  # materialize the input before timing
st = PageRankStats()
t0 = time.monotonic()
pagerank(edges, tol=0.0, max_iter=5, stats=st,
         hub_degree_threshold=(threshold if variant == "split" else None)).count()
wall = time.monotonic() - t0
half = sorted(st.iter_wall_s[len(st.iter_wall_s) // 2:])
out = {"variant": variant, "edges": n_edges, "threshold": threshold,
       "alpha": alpha,
       "wall_s": round(wall, 1), "setup_s": round(st.setup_wall_s, 1),
       "iter_wall_s": st.iter_wall_s,
       "steady_iter_s": half[len(half) // 2],
       "floor_iter_s": min(st.iter_wall_s),
       "cpus": cpus}
print("RESULT " + json.dumps(out))
"""

EQUALITY_RUNNER = r"""
import json, sys
from pyspark.sql import functions as F
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges
from rad_ecg_spark.operators.pagerank import pagerank
from rad_ecg_spark.operators.skew import split_hub_edges

cpus, n_edges, threshold = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
alpha = float(sys.argv[4])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges, partitions=cpus, src_skew="powerlaw",
                    powerlaw_alpha=alpha)
edges.count()

# degree profile: how skewed is the input, how many hubs clear threshold
deduped = edges.dropDuplicates(["src", "dst"])
deg = deduped.groupBy("src").agg(F.count(F.lit(1)).alias("d")).persist()
n_dedup = deduped.count()
top = deg.orderBy(F.desc("d")).limit(1).collect()[0]
n_hubs = deg.filter(F.col("d") >= threshold).count()
hub_edges = deg.filter(F.col("d") >= threshold).agg(F.sum("d")).collect()[0][0]
deg.unpersist()

base = pagerank(edges, tol=0.0, max_iter=5).withColumnRenamed("rank", "r_base")
split = pagerank(edges, tol=0.0, max_iter=5, hub_degree_threshold=threshold)
j = base.join(split, "id")
row = j.agg(F.max(F.abs(F.col("rank") - F.col("r_base"))).alias("maxdiff"),
            F.count(F.lit(1)).alias("n")).collect()[0]
print("EQUALITY " + json.dumps({
    "edges_dedup": n_dedup, "top_src_degree": top["d"],
    "top_src_share": round(top["d"] / n_dedup, 4),
    "hubs_at_threshold": n_hubs,
    "hub_edge_share": round(hub_edges / n_dedup, 4),
    "vertices_compared": row["n"],
    "max_abs_rank_diff": row["maxdiff"]}))
"""


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    threshold = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    alpha = sys.argv[5] if len(sys.argv) > 5 else "6.0"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(code: str, args: list[str], tag: str) -> None:
        out = subprocess.run(
            [sys.executable, "-c", code, *args],
            capture_output=True, text=True, cwd=repo, timeout=5400,
        )
        hits = [l for l in out.stdout.splitlines()
                if l.startswith(("RESULT ", "EQUALITY "))]
        if not hits:
            print(f"FAILED {tag}:\n{out.stdout[-1200:]}\n{out.stderr[-1200:]}")
        for h in hits:
            print(h, flush=True)

    for i in range(pairs):  # interleaved: unsplit, split, unsplit, split...
        for variant in ("unsplit", "split"):
            run(TIMING_RUNNER,
                [variant, str(cpus), str(n_edges), str(threshold), alpha],
                f"{variant}#{i}")
    run(EQUALITY_RUNNER, [str(cpus), str(n_edges), str(threshold), alpha],
        "equality")


if __name__ == "__main__":
    main()
