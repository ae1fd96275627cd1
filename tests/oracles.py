"""Single-node oracle implementations (NumPy / pure Python).

These mirror the reference's test strategy: closed-form or brute-force
expected values computed independently of the engine under test
(/root/reference/tests/test_rad_ecg.py:110-168)."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

import numpy as np


def pagerank_oracle(
    edges: list[tuple],
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 1000,
    tol_mode: str = "abs",
    return_iters: bool = False,
):
    """Power iteration with dangling-mass redistribution.

    ``tol_mode="rel"`` mirrors the engine's scale-invariant criterion:
    effective absolute tolerance tol/n (delta relative to the uniform
    rank 1/n). ``return_iters=True`` returns (ranks, iterations) so
    tests can pin the engine's iteration count to the oracle's under
    the SAME criterion, not just the converged ranks."""
    verts = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out: dict[int, list[int]] = defaultdict(list)
    for s, d in set(edges):
        if s != d:
            out[idx[s]].append(idx[d])
    eff_tol = tol if tol_mode == "abs" else tol / n
    r = np.full(n, 1.0 / n)
    iters = 0
    for _ in range(max_iter):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            tgts = out.get(u, [])
            if not tgts:
                dangling += r[u]
            else:
                w = r[u] / len(tgts)
                for v in tgts:
                    nxt[v] += w
        nxt = (1 - damping) / n + damping * (nxt + dangling / n)
        iters += 1
        if np.max(np.abs(nxt - r)) < eff_tol:
            r = nxt
            break
        r = nxt
    ranks = {v: float(r[idx[v]]) for v in verts}
    return (ranks, iters) if return_iters else ranks


def components_oracle(edges: list[tuple], extra_vertices: list | None = None) -> dict:
    """Union-find; component = min member."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for e in edges:
        for u in e:
            parent.setdefault(u, u)
    for v in extra_vertices or []:
        parent.setdefault(v, v)
    for s, d in edges:
        union(s, d)
    groups: dict = defaultdict(list)
    for v in parent:
        groups[find(v)].append(v)
    out = {}
    for members in groups.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def label_prop_oracle(edges: list[tuple], max_iter: int = 10) -> dict:
    """Synchronous LP, most-frequent neighbor label, ties -> min label."""
    nbrs: dict = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    verts = sorted({u for e in edges for u in e})
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nbrs[v])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


def triangles_oracle(edges: list[tuple]) -> tuple[int, dict]:
    """Brute force over adjacency sets: (global_count, per_vertex)."""
    nbrs: dict = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    verts = sorted(nbrs)
    per = Counter()
    total = 0
    for v in verts:
        for a, b in combinations(sorted(nbrs[v]), 2):
            if v < a and v < b and b in nbrs[a]:
                total += 1
                per[v] += 1
                per[a] += 1
                per[b] += 1
    return total, dict(per)


def random_graph(n: int, m: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic random directed graph on vertices 0..n-1."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return [(int(s), int(d)) for s, d in zip(src, dst) if s != d]
