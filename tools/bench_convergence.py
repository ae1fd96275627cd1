"""Bench-scale convergence: iterations-to-1e-6 wall time (BASELINE.json
metric, second clause) on the 10-20M-edge synthetic bench graph — the
same graph/partitioning as the throughput headline, run to FULL
convergence (damping 0.85, L-inf delta < 1e-6) instead of a fixed
5-iteration probe, once without and once with per-iteration durable
checkpointing, so the checkpoint overhead per iteration is measured at
scale rather than extrapolated from sf0.001.

Each config runs in its own JVM (subprocess) so JIT/GC state cannot
leak between the plain and checkpointed runs.

Usage: python tools/bench_convergence.py [n_edges] [n_cpus] [max_iter]
Prints one JSON line per config plus a summary; paste into
BENCH/BASELINE.md section 'Convergence benchmark'.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import json, shutil, sys, tempfile, time
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges
from rad_ecg_spark.operators.pagerank import pagerank, PageRankStats

cpus, n_edges, max_iter, parts = (int(a) for a in sys.argv[1:5])
mode = sys.argv[5]  # plain | plain_rel | ckpt | ckpt_async | ckpt_every5 | ...
with_ckpt = mode not in ("plain", "plain_rel")
every = 5 if mode.endswith("every5") else 1
tol_mode = "rel" if mode.endswith("_rel") else "abs"
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=parts,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges, partitions=parts)
edges.count()
ckpt_dir = None
ckpt = None
if with_ckpt:
    ckpt_dir = tempfile.mkdtemp(prefix="conv-ckpt-")
    from rad_ecg_spark.plans.checkpoint import CheckpointManager
    ckpt = CheckpointManager(spark, ckpt_dir, "pagerank",
                             async_write="async" in mode)
st = PageRankStats()
t0 = time.monotonic()
ranks = pagerank(edges, tol=1e-6, tol_mode=tol_mode, max_iter=max_iter,
                 num_partitions=parts, stats=st, checkpointer=ckpt,
                 checkpoint_every=every)
n = ranks.count()
wall = time.monotonic() - t0
half = sorted(st.iter_wall_s[len(st.iter_wall_s)//2:])
if ckpt_dir:
    shutil.rmtree(ckpt_dir, ignore_errors=True)
print("RESULT " + json.dumps({
    "config": mode, "tol_mode": tol_mode,
    "cpus": cpus, "edges": st.num_edges, "vertices": n,
    "iterations": st.iterations, "converged": st.converged,
    "total_wall_s": round(wall, 1), "setup_s": round(st.setup_wall_s, 2),
    "best_iter_s": round(min(st.iter_wall_s[1:]), 3),
    "median_steady_iter_s": round(half[len(half)//2], 3),
    "iter_wall_s_first5_last5": [round(x, 2) for x in
                                 st.iter_wall_s[:5] + st.iter_wall_s[-5:]],
}))
"""


def run_once(cpus: int, n_edges: int, max_iter: int, parts: int, mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER,
         str(cpus), str(n_edges), str(max_iter), str(parts), mode],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=5400,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result ({mode}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    from rad_ecg_spark.operators.graph_core import EDGE_ROWS_PER_PARTITION

    parts = max(2, n_edges // EDGE_ROWS_PER_PARTITION)
    modes = (sys.argv[4].split(",") if len(sys.argv) > 4
             else ["plain", "ckpt", "ckpt_async", "ckpt_every5"])
    results = {}
    for mode in modes:
        results[mode] = run_once(n_cpus, n_edges, max_iter, parts, mode)
        print(json.dumps(results[mode]), flush=True)
    plain = results.get("plain")
    if plain:
        summary = {
            "edges": plain["edges"], "partitions": parts, "cpus": n_cpus,
            "iterations_to_1e-6": plain["iterations"],
            "converged": all(r["converged"] for r in results.values()),
            "total_wall_plain_s": plain["total_wall_s"],
        }
        for mode, r in results.items():
            if mode == "plain":
                continue
            summary[f"total_wall_{mode}_s"] = r["total_wall_s"]
            summary[f"{mode}_vs_plain"] = round(
                r["total_wall_s"] / plain["total_wall_s"], 2
            )
        print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
