"""Scale-headroom runs for triangle counting and label propagation on
the synthetic bench graph — fresh JVM per algorithm (subprocess), single
noise-floored run, converged/exact outputs (BENCH/BASELINE.md 'Scale
headroom' protocol; PageRank and CC already have 50M-edge rows).

Usage: python tools/bench_graph_headroom.py [n_edges] [n_cpus] [algos]
       algos: comma list from {triangles, labelprop} (default both)
Prints one RESULT json line per algorithm.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import json, sys, time
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges

algo, cpus, n_edges, parts = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
conf = {"spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "48g"}
if algo == "triangles" and n_edges >= 100_000_000:
    # the 100M+ wedge stream overruns the tmpfs shuffle dir (shared with
    # heap + page cache) — big one-shot shuffles go to disk
    # (BENCH/BASELINE.md round-4 substrate lesson)
    import os as _os
    _os.makedirs("/tmp/spark-local-big", exist_ok=True)
    conf["spark.local.dir"] = "/tmp/spark-local-big"
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=parts,
                  extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges, partitions=parts)
edges.count()  # materialize input before timing
if algo == "triangles":
    from rad_ecg_spark.operators.triangles import triangle_count
    t0 = time.monotonic()
    n = triangle_count(edges)
    wall = time.monotonic() - t0
    out = {"algo": "triangles", "edges": n_edges, "triangles": n,
           "total_wall_s": round(wall, 1),
           "edges_per_sec": round(n_edges / wall)}
elif algo == "labelprop":
    from rad_ecg_spark.operators.labelprop import LabelPropStats, label_propagation
    st = LabelPropStats()
    t0 = time.monotonic()
    labels = label_propagation(edges, max_iter=30, stats=st)
    n_labels = labels.select("label").distinct().count()
    wall = time.monotonic() - t0
    best = min(st.iter_wall_s[1:]) if len(st.iter_wall_s) > 1 else st.iter_wall_s[0]
    out = {"algo": "labelprop", "edges": n_edges,
           "rounds": st.iterations, "converged": st.converged,
           "distinct_labels": n_labels,
           "total_wall_s": round(wall, 1),
           "best_round_s": round(best, 2),
           "change_tail": st.changes[-4:],
           "msgs_per_sec_best_round": round(2 * n_edges / best)}
else:
    raise SystemExit(f"unknown algo {algo}")
out["cpus"] = cpus
out["partitions"] = parts
print("RESULT " + json.dumps(out))
"""


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    algos = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["triangles", "labelprop"])
    from rad_ecg_spark.operators.graph_core import EDGE_ROWS_PER_PARTITION

    parts = max(2, n_edges // EDGE_ROWS_PER_PARTITION)
    for algo in algos:
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, algo, str(n_cpus), str(n_edges), str(parts)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=5400,
        )
        hit = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not hit:
            print(f"FAILED {algo}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
            continue
        print(hit[0][len("RESULT "):], flush=True)


if __name__ == "__main__":
    main()
