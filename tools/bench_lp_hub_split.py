"""Label-propagation twin of tools/bench_hub_split.py: LP rounds on a
power-law OUT-degree graph with and without ``hub_degree_threshold``,
interleaved fresh-JVM pairs. LP's split is BITWISE identical to the
unsplit plan (integer message counts — asserted per-run by comparing
the per-round change vectors, which the runner prints).

Usage: python tools/bench_lp_hub_split.py [n_edges] [cpus] [pairs]
                                          [threshold] [alpha] [rounds]
Prints one RESULT json line per run; raw round-5 lines in
BENCH/lp_hub_split_r05.log.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import json, sys, time
from rad_ecg_spark.session import get_spark
from rad_ecg_spark.sources.synth_graph import synth_edges
from rad_ecg_spark.operators.labelprop import LabelPropStats, label_propagation

variant, cpus, n_edges, threshold, alpha, rounds = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    float(sys.argv[5]), int(sys.argv[6]))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")
edges = synth_edges(spark, n_edges, partitions=cpus, src_skew="powerlaw",
                    powerlaw_alpha=alpha)
edges.count()
st = LabelPropStats()
t0 = time.monotonic()
label_propagation(edges, max_iter=rounds, stats=st,
                  hub_degree_threshold=(threshold if variant == "split" else None)
                  ).count()
wall = time.monotonic() - t0
half = sorted(st.iter_wall_s[len(st.iter_wall_s)//2:])
print("RESULT " + json.dumps({
    "variant": variant, "edges": n_edges, "alpha": alpha,
    "threshold": threshold, "rounds": st.iterations,
    "wall_s": round(wall, 1), "iter_wall_s": st.iter_wall_s,
    "steady_round_s": half[len(half)//2],
    "floor_round_s": min(st.iter_wall_s),
    "changes": st.changes, "cpus": cpus}))
"""


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    threshold = sys.argv[4] if len(sys.argv) > 4 else "8192"
    alpha = sys.argv[5] if len(sys.argv) > 5 else "12"
    rounds = sys.argv[6] if len(sys.argv) > 6 else "5"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for _ in range(pairs):
        for variant in ("unsplit", "split"):
            out = subprocess.run(
                [sys.executable, "-c", RUNNER, variant, str(cpus),
                 str(n_edges), threshold, alpha, rounds],
                capture_output=True, text=True, cwd=repo, timeout=5400,
            )
            hits = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
            if not hits:
                print(f"FAILED {variant}:\n{out.stdout[-1200:]}\n"
                      f"{out.stderr[-1200:]}")
            for h in hits:
                print(h, flush=True)


if __name__ == "__main__":
    main()
