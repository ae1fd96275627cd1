"""Memory-bandwidth appendix for BENCH/BASELINE.md.

Barrier-synchronized multiprocess memcpy (numpy copyto): all workers
start together, each copies a fixed byte volume, aggregate GB/s =
total bytes / slowest-worker wall. Run it a few times — on this
virtualized host concurrent-stream results swing with hypervisor
scheduling (the same 2-5x noise the Spark iterations see), which is
itself the point: the substrate, not the engine, is what varies.

Usage: python tools/bench_membw.py [mb_per_copy] [copies_per_worker]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def worker(mb: int, n_copies: int, barrier, q) -> None:
    d = np.empty(mb * 131072)
    s = np.ones(mb * 131072)
    barrier.wait()
    t0 = time.monotonic()
    for _ in range(n_copies):
        np.copyto(d, s)
    q.put(time.monotonic() - t0)


def measure(procs: int, mb: int, n_copies: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [
        mp.Process(target=worker, args=(mb, n_copies, barrier, q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    walls = [q.get() for _ in ps]
    for p in ps:
        p.join()
    total_mb = 2 * mb * n_copies * procs  # read + write
    return total_mb / max(walls) / 1024


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    out = {}
    for n in (1, 2, 4, 8, 16, 32):
        out[n] = round(measure(n, mb, n_copies), 2)
        print(f"procs={n:3d}  memcpy {out[n]:7.2f} GB/s", flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
