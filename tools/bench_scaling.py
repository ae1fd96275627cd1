"""Scaling-efficiency evidence for the north_rule's N-vs-4N criterion.

Runs the identical PageRank job on the identical deterministic input at
two parallelism levels (local[8] and local[32] — the sandbox stand-in
for N- and 4N-executor clusters per BASELINE.md §3), in separate JVMs,
and reports steady-state edges/sec/iteration plus
efficiency = (throughput_32 / throughput_8) / 4.

Usage: python tools/bench_scaling.py [n_edges] [iters]
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges
from rad_ecg_spark.operators.pagerank import pagerank, PageRankStats

cpus, n_edges, iters = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges, partitions=cpus)
edges.count()
st = PageRankStats()
pagerank(edges, tol=0.0, max_iter=iters, num_partitions=cpus, stats=st).count()
# steady state = median of the last half (skips JIT/page-cache warmup)
half = st.iter_wall_s[len(st.iter_wall_s)//2:]
half_sorted = sorted(half)
med = half_sorted[len(half_sorted)//2]
print("RESULT " + json.dumps({
    "cpus": cpus, "edges": st.num_edges, "iters": st.iterations,
    "setup_s": round(st.setup_wall_s, 2), "iter_wall_s": st.iter_wall_s,
    "steady_iter_s": round(med, 3),
    "edges_per_sec_iter": round(st.num_edges/med),
}))
"""


def run_once(cpus: int, n_edges: int, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(n_edges), str(iters)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result from local[{cpus}] run:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def run(cpus: int, n_edges: int, iters: int, repeats: int = 1) -> dict:
    """Best-of-N: the sandbox has noisy co-tenancy; external noise only
    ever slows a run down, so the fastest repeat is the engine's number."""
    results = [run_once(cpus, n_edges, iters) for _ in range(repeats)]
    best = min(results, key=lambda r: r["steady_iter_s"])
    best["all_steady_iter_s"] = [r["steady_iter_s"] for r in results]
    return best


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    n_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    r8 = run(n_cpus, n_edges, iters)
    r32 = run(4 * n_cpus, n_edges, iters)
    eff = (r32["edges_per_sec_iter"] / r8["edges_per_sec_iter"]) / 4
    result = {f"local{n_cpus}": r8, f"local{4*n_cpus}": r32, "efficiency": round(eff, 3)}
    print(json.dumps(result, indent=2))

    md = f"""# BENCH/BASELINE — throughput + scaling evidence

Protocol (BASELINE.md §3): identical PageRank job, identical
deterministic input ({r8['edges']:,} edges, {iters} iterations, tol=0),
run in separate JVMs at two parallelism levels. Steady-state
per-iteration wall = median of the last half of iterations (skips JIT
warmup), best of {len(r8['all_steady_iter_s'])} repeats per config (the
sandbox is noisy-co-tenant; noise only slows runs, so min is the
engine's number). All repeats: N={r8['all_steady_iter_s']},
4N={r32['all_steady_iter_s']}.

| config | shuffle partitions | setup s | steady s/iter | edges/sec/iteration |
|---|---|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['cpus']}  | {r8['setup_s']}  | {r8['steady_iter_s']}  | {r8['edges_per_sec_iter']:,} |
| local[{r32['cpus']}] (4N) | {r32['cpus']} | {r32['setup_s']} | {r32['steady_iter_s']} | {r32['edges_per_sec_iter']:,} |

**Scaling efficiency = (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target >= 0.8, north_rule)

Per-iteration walls (s):
- local[{r8['cpus']}]:  {r8['iter_wall_s']}
- local[{r32['cpus']}]: {r32['iter_wall_s']}

Notes
- Identical input at any parallelism: the edge generator is a pure
  function of (seed, E, V) evaluated JVM-side (sources/synth_graph.py).
- The same-input requirement plus deterministic tie-breaks make outputs
  bitwise-stable across both configs (SURVEY.md §7.3).
- On a real cluster this maps to N vs 4N executors with
  spark.sql.shuffle.partitions scaled 4x; local mode shares one JVM so
  memory-bandwidth contention puts an upper bound on measured
  efficiency that a real cluster does not have.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
