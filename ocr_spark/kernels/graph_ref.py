"""Spark-free PageRank reference — the golden for operators/graph.py.

Mirrors the operator's cross-engine contract exactly: uniform teleport,
dangling-mass redistribution, and a float32 cast per iteration
(np.float32, matching the engine's CAST(... AS FLOAT)). Shared by
tests/test_graph.py and BENCH/soak_graph.py so the contract lives in
ONE place (two drifting copies would let one check validate stale
semantics).

Summation-order note: Python accumulates contributions in sorted-edge
order while Spark sums in partition order; pre-quantization doubles can
differ ~1e-16, which the float32 grid absorbs except exactly on a
rounding boundary (~1e-8 odds per value — soak_graph measured zero
across 500k node-iterations).
"""

from __future__ import annotations

import numpy as np


def ref_pagerank(
    edge_list,
    damping: float = 0.85,
    iters: int = 3,
) -> dict:
    """(src, dst) iterable -> {node: np.float32 rank} after ``iters``
    power iterations; multi-edges collapse (set), like the operator."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = float(len(nodes))
    out: dict = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: np.float32(1.0 / n) for v in nodes}
    for _ in range(iters):
        contrib: dict = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0.0) + float(rank[s]) / float(
                out[s]
            )
        dang = sum(float(rank[v]) for v in nodes if v not in out)
        base = (1.0 - damping) / n
        rank = {
            v: np.float32(
                base + damping * (contrib.get(v, 0.0) + dang / n)
            )
            for v in nodes
        }
    return rank


def ref_hits(edge_list, iters: int = 3) -> dict:
    """(src, dst) iterable -> {node: (np.float32 hub, np.float32 auth)}
    after ``iters`` HITS iterations — mirrors operators/graph.hits:
    Kleinberg update order (new authority feeds the hub step), L1
    normalization, float32 cast per normalization, multi-edges collapse.
    Same summation-order caveat as ref_pagerank."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    hub = {v: np.float32(1.0) for v in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {v: 0.0 for v in nodes}
        for s, t in edges:
            raw_a[t] += float(hub[s])
        na = sum(raw_a[v] for v in nodes)
        auth = {v: np.float32(raw_a[v] / na) for v in nodes}
        raw_h = {v: 0.0 for v in nodes}
        for s, t in edges:
            raw_h[s] += float(auth[t])
        nh = sum(raw_h[v] for v in nodes)
        hub = {v: np.float32(raw_h[v] / nh) for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}
