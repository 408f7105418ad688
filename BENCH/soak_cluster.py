#!/usr/bin/env python
"""Clustering-family soak: kmeans_assign / semantic_dedup_kmeans /
d4_select checked EXACTLY against a pure-numpy reference at corpus
scale, by constructing a corpus where every float the pipeline touches
is reproducible bit-for-bit.

Geometry (all values dyadic rationals, exact in float32 AND in every
float64 sum the pipeline forms):

- 8 planted clusters on one-hot axes e0..e7; ``cluster(id) = id % 8``
  so the k lowest-id seed vectors land one per cluster.
- member noise: two dims from the 56 non-axis dims with magnitudes
  from {0.25, 0.375, 0.5, 0.625, 0.75} (multiples of 2**-10), combo
  enumerated per member — distinct members share at most one (dim,
  mag) so the max non-duplicate within-cluster cosine is ~0.9961,
  leaving a clean margin to the 0.9999 dedup threshold.
- planted near-dups: vector(j) = 2 * vector(j - 8) for odd member
  offsets in a fixed range — exact scaled copies (round-4 cos = 1.0),
  same cluster by construction.
- cluster sizes are powers of two, so every Lloyd update average is
  an EXACT dyadic rational (sums of bounded dyadics are exact in
  float64 in ANY aggregation order — Spark's partial-agg order cannot
  matter), and the 6-dp centroid round has no representable ties; the
  numpy reference reproduces it through integer/Fraction HALF_UP
  arithmetic, mirroring Spark's BigDecimal round.
- assignment folds are left-to-right both sides (engine ``aggregate``
  lambda vs ``np.add.accumulate``), so even the iteration-2 cosines
  against non-dyadic rounded centroids are bit-identical.

Phase A (scale): 262,144 x 64 vectors (2**15 per cluster, 1,000
planted dups) — kmeans_assign must match the reference on every
(cid, cos) EXACTLY; reports assignment throughput.

Phase B (pair stage): 8,192 vectors (2**10 per cluster, 200 planted
dups) so the within-cluster pair space (~4.2M pairs) is soak-sized —
semantic_dedup_kmeans must drop EXACTLY the reference's pair-computed
loser set (== the planted dups), d4_select must additionally drop
EXACTLY the reference's per-cluster prototype ranks, and 100 docs
without embedding rows must survive both.

Run: python BENCH/soak_cluster.py
Prints one JSON line; exit 0 iff every check is exact.
"""

from __future__ import annotations

import json
import math
import sys
import time
from fractions import Fraction
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 8
D = 64
N_NOISE_DIMS = D - K  # 56
MAGS = [0.25, 0.375, 0.5, 0.625, 0.75]
_PAIRS = [
    (i, j)
    for i in range(N_NOISE_DIMS)
    for j in range(i + 1, N_NOISE_DIMS)
]
PAIR_D1 = np.array([p[0] for p in _PAIRS])
PAIR_D2 = np.array([p[1] for p in _PAIRS])
MAG_ARR = np.array(MAGS)


def base_vectors(ids: np.ndarray) -> np.ndarray:
    """Deterministic member vector for each id (float32-exact dyadics)."""
    n = len(ids)
    v = np.zeros((n, D), np.float32)
    c = (ids % K).astype(np.int64)
    m = (ids // K).astype(np.int64)
    if m.size and m.max() >= len(_PAIRS) * 25:
        raise ValueError("member index exceeds the noise-combo space")
    rows = np.arange(n)
    v[rows, c] = 1.0
    p, q = m // 25, m % 25
    v[rows, K + PAIR_D1[p]] = MAG_ARR[q // 5]
    v[rows, K + PAIR_D2[p]] = MAG_ARR[q % 5]
    return v


def gen_vectors(ids: np.ndarray, dup_lo: int, dup_pairs: int) -> np.ndarray:
    """Member vectors with planted dups: odd member offsets in
    [dup_lo, dup_lo + 2*dup_pairs) are 2x the preceding member of the
    same cluster (id - 8)."""
    m = ids // K
    isdup = (
        (m >= dup_lo) & (m < dup_lo + 2 * dup_pairs) & ((m - dup_lo) % 2 == 1)
    )
    v = base_vectors(np.where(isdup, ids - K, ids))
    v[isdup] *= np.float32(2.0)
    return v


def dup_ids(n: int, dup_lo: int, dup_pairs: int) -> set[int]:
    ids = np.arange(n)
    m = ids // K
    mask = (
        (m >= dup_lo) & (m < dup_lo + 2 * dup_pairs) & ((m - dup_lo) % 2 == 1)
    )
    return set(ids[mask].tolist())


def _seq_fold_dot(v64: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Left-to-right fold of v64 * c per row — Spark's aggregate order."""
    return np.add.accumulate(v64 * c, axis=1)[:, -1]


def _round6_half_up(total: float, count: int) -> float:
    """round(avg, 6) exactly as Spark: the sum is an exact multiple of
    2**-10, count a power of two, so avg = m / 2**25 exactly; HALF_UP
    on the exact rational, then the nearest double to k * 10**-6."""
    m = int(round(total * 1024))  # exact integer by construction
    fr = Fraction(m, 1024 * count)
    k = (fr.numerator * 10**6 + fr.denominator // 2) // fr.denominator
    return float(Fraction(k, 10**6))


def ref_kmeans(v64: np.ndarray, iters: int = 2):
    """Numpy reference of clustering.kmeans_assign: returns (cids,
    cos4, centroids) with centroids as the final list[(cid, array)]."""
    n = v64.shape[0]
    nrm = np.sqrt(np.add.accumulate(v64 * v64, axis=1)[:, -1])
    cents = [(cid, v64[cid].copy()) for cid in range(K)]

    def assign(cents):
        cos = np.empty((n, len(cents)))
        for idx, (cid, c) in enumerate(cents):
            cn = math.sqrt(sum(float(x) * float(x) for x in c))
            cos[:, idx] = np.round(_seq_fold_dot(v64, c) / (nrm * cn), 4)
        best = np.argmax(cos, axis=1)  # first max = smallest cid on ties
        cids = np.array([cents[i][0] for i in best])
        return cids, cos[np.arange(n), best]

    for _ in range(iters):
        cids, _ = assign(cents)
        new = []
        for cid in sorted(set(cids.tolist())):
            sel = v64[cids == cid]
            cent = np.array(
                [_round6_half_up(float(s), sel.shape[0]) for s in sel.sum(0)]
            )
            new.append((cid, cent))
        cents = new
    cids, cos4 = assign(cents)
    return cids, cos4, cents


def ref_pair_losers(v64, cids, threshold: float) -> set[int]:
    """Within-cluster pairs with round-4 cos >= threshold: larger id
    loses. All sums exact dyadics, so matmul order is irrelevant."""
    nrm = np.sqrt((v64 * v64).sum(1))
    losers: set[int] = set()
    for cid in np.unique(cids):
        idx = np.where(cids == cid)[0]
        sub = v64[idx]
        cos = np.round((sub @ sub.T) / np.outer(nrm[idx], nrm[idx]), 4)
        ii, jj = np.where(cos >= threshold)
        losers.update(int(idx[j]) for i, j in zip(ii, jj) if idx[i] < idx[j])
    return losers


def ref_d4_dropped(cids, cos4, losers, prune_frac: float) -> set[int]:
    dropped = set(losers)
    surv = np.array([i for i in range(len(cids)) if i not in losers])
    for cid in np.unique(cids[surv]):
        mem = surv[cids[surv] == cid]
        order = mem[np.lexsort((mem, -cos4[mem]))]  # cos desc, id asc
        cut = int(np.floor(prune_frac * float(len(mem))))
        dropped.update(int(i) for i in order[:cut])
    return dropped


def gen_partition_embeddings(batches):
    """mapInPandas generator over spark.range ids — dup-free member
    vectors (the scaling_ops kmeans corpus; ids must stay below the
    308k combo cap)."""
    import pandas as pd

    for pdf in batches:
        ids = pdf["id"].to_numpy()
        v = base_vectors(ids)
        yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})


def _emb_df(spark, n: int, dup_lo: int, dup_pairs: int):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            v = gen_vectors(ids, dup_lo, dup_pairs)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(v)}
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )


def main() -> int:
    import pandas as pd
    from pyspark.sql import SparkSession

    from ocr_spark.operators.clustering import (
        d4_select,
        kmeans_assign,
        semantic_dedup_kmeans,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-cluster")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {}

    # ---- Phase A: assignment exactness + throughput at 262k x 64 ----
    n_a = K * 32768
    emb_a = _emb_df(spark, n_a, dup_lo=1000, dup_pairs=125).cache()
    emb_a.count()
    t0 = time.time()
    got = (
        kmeans_assign(emb_a, k=K, iters=2, vec_dims=D)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    wall_a = time.time() - t0
    v64 = base_vectors(np.arange(n_a)).astype(np.float64)
    dups_a = sorted(dup_ids(n_a, 1000, 125))
    v64[dups_a] = base_vectors(np.array(dups_a) - K) * 2.0
    cids, cos4, _ = ref_kmeans(v64)
    cid_mism = int((got["cid"].to_numpy() != cids).sum())
    cos_mism = int(
        (np.abs(got["cos"].to_numpy() - cos4) > 1e-12).sum()
    )
    planted_agree = float((cids == np.arange(n_a) % K).mean())
    res.update(
        n_phase_a=n_a,
        wall_assign_s=round(wall_a, 1),
        vec_per_sec=int(n_a / wall_a),
        cid_mismatches=cid_mism,
        cos_mismatches=cos_mism,
        planted_membership=round(planted_agree, 6),
    )
    emb_a.unpersist()

    # ---- Phase B: pair-stage exactness at 8k (4.2M in-cluster pairs) --
    n_b = K * 1024
    dup_lo_b, dup_pairs_b = 100, 25
    emb_b = _emb_df(spark, n_b, dup_lo_b, dup_pairs_b).cache()
    emb_b.count()
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n_b + 100), "text": ["t"] * (n_b + 100)})
    )
    v64b = base_vectors(np.arange(n_b)).astype(np.float64)
    dups_b = sorted(dup_ids(n_b, dup_lo_b, dup_pairs_b))
    v64b[dups_b] = base_vectors(np.array(dups_b) - K) * 2.0
    cids_b, cos4_b, _ = ref_kmeans(v64b)
    losers = ref_pair_losers(v64b, cids_b, 0.9999)

    t0 = time.time()
    kept_sem = {
        r.doc_id
        for r in semantic_dedup_kmeans(
            docs, emb_b, k=K, iters=2, threshold=0.9999, vec_dims=D
        ).select("doc_id").collect()
    }
    wall_sem = time.time() - t0
    exp_sem = set(range(n_b + 100)) - losers
    res.update(
        n_phase_b=n_b,
        n_planted_dups=len(dups_b),
        losers_match_planted=losers == set(dups_b),
        semdedup_exact=kept_sem == exp_sem,
        wall_semdedup_s=round(wall_sem, 1),
    )

    t0 = time.time()
    kept_d4 = {
        r.doc_id
        for r in d4_select(
            docs, emb_b, k=K, iters=2, threshold=0.9999,
            prune_frac=0.2, vec_dims=D,
        ).select("doc_id").collect()
    }
    wall_d4 = time.time() - t0
    exp_d4 = set(range(n_b + 100)) - ref_d4_dropped(
        cids_b, cos4_b, losers, 0.2
    )
    res.update(
        d4_exact=kept_d4 == exp_d4,
        n_d4_kept=len(kept_d4),
        wall_d4_s=round(wall_d4, 1),
    )

    ok = (
        cid_mism == 0
        and cos_mism == 0
        and res["losers_match_planted"]
        and res["semdedup_exact"]
        and res["d4_exact"]
    )
    res["ok"] = ok
    print(json.dumps(res))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
