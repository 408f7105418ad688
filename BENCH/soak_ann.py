#!/usr/bin/env python
"""ANN soak: LSH-bucketed cosine top-k vs brute force at 100k vectors.

Measures (a) wall time of both paths and (b) recall@5 of the bucketed
path against exact brute-force neighbours for 50 query vectors, on a
deterministic 64-dim corpus with planted near-neighbour clusters (pure
random vectors have no meaningful neighbours to recall).

Run: python BENCH/soak_ann.py [n_vecs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_QUERIES = 50
K = 5
CACHE = Path("/tmp/ocr_spark_bench") / f"ann_corpus_{N_VECS}.parquet"


def gen_partition(batches):
    import numpy as np
    import pandas as pd

    for pdf in batches:
        ids = pdf["id"].to_numpy()
        rng = np.random.default_rng(7)
        # 200 cluster centroids; each vector = centroid + noise, so every
        # vector has true near neighbours (same cluster)
        centroids = rng.standard_normal((200, 64))
        out_ids, vecs = [], []
        for i in ids:
            r = np.random.default_rng(9 << 20 | int(i))
            c = centroids[int(i) % 200]
            v = c + 0.35 * r.standard_normal(64)
            v = v / np.linalg.norm(v)
            out_ids.append(int(i))
            vecs.append([float(x) for x in v])
        yield pd.DataFrame({"vec_id": out_ids, "embedding": vecs})


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_cosine_topk,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-ann")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if not (CACHE / "_SUCCESS").exists():
        (
            spark.range(N_VECS)
            .repartition(64)
            .mapInPandas(gen_partition, "vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    emb = spark.read.parquet(str(CACHE))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    t0 = time.time()
    exact = {
        (r.q_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=K).collect()
    }
    t_exact = time.time() - t0

    results = {
        "n_vecs": emb.count(),
        "n_queries": N_QUERIES,
        "k": K,
        "brute_force_s": round(t_exact, 1),
    }
    for tables in (1, 6):
        t0 = time.time()
        approx = {
            (r.q_id, r.vec_id)
            for r in lsh_cosine_topk(
                emb, queries, k=K, dims=8, tables=tables
            ).collect()
        }
        t_approx = time.time() - t0
        results[f"lsh_t{tables}_s"] = round(t_approx, 1)
        results[f"lsh_t{tables}_recall_at_5"] = round(
            len(exact & approx) / len(exact), 4
        )
    # untimed warmup: first mapInPandas pays python-worker spin-up
    ivf_topk(emb, queries, k=K, n_centroids=256, n_probe=1).count()
    for n_cent, n_probe in ((256, 8), (256, 32)):
        t0 = time.time()
        approx = {
            (r.q_id, r.vec_id)
            for r in ivf_topk(
                emb, queries, k=K, n_centroids=n_cent, n_probe=n_probe
            ).collect()
        }
        t_approx = time.time() - t0
        results[f"ivf_c{n_cent}_p{n_probe}_s"] = round(t_approx, 1)
        results[f"ivf_c{n_cent}_p{n_probe}_recall_at_5"] = round(
            len(exact & approx) / len(exact), 4
        )
    # PQ/ADC: compressed-domain brute scan (no pruning — fidelity comes
    # from codebook capacity). Wall includes codebook training + encode;
    # m=4/ksub=16 are the gate params, m=8/ksub=32 the recall config.
    from ocr_spark.operators.pq import pq_ann_topk

    for m, ksub, refine in ((4, 16, None), (4, 16, 100), (4, 16, 500)):
        t0 = time.time()
        approx = {
            (r.q_id, r.vec_id)
            for r in pq_ann_topk(
                emb, queries, k=K, m=m, ksub=ksub, iters=1, vec_dims=64,
                refine=refine,
            ).collect()
        }
        t_approx = time.time() - t0
        tag = f"pq_m{m}_k{ksub}_r{refine or 0}"
        results[f"{tag}_s"] = round(t_approx, 1)
        results[f"{tag}_recall_at_5"] = round(
            len(exact & approx) / len(exact), 4
        )
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
