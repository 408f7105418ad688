#!/usr/bin/env python
"""Near-dup dedup soak: MinHash+LSH over a 100k-document corpus with
injected mutated duplicates — measures wall time AND recall/precision of
the LSH candidate path at 20x the sf0.1 documents table.

Corpus: deterministic word-soup docs; 10% of docs get a near-duplicate
twin with ~10% of words replaced (true Jaccard ~0.8, well above the 0.5
verification threshold used here).

Run: python BENCH/soak_dedup.py [n_docs]
Prints one JSON line {wall_s, n_docs, injected, recalled, recall,
extra_pairs}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DUP_RATE = 0.10
CACHE = Path("/tmp/ocr_spark_bench") / f"dedup_corpus_{N_DOCS}.parquet"


def gen_partition(batches):
    import random

    import pandas as pd

    words = (
        "spark shuffle partition arrow batch kernel vector column parquet "
        "iceberg lineage checkpoint resume transcript conversation turn "
        "extract content boilerplate density heuristic ensemble vote "
        "pipeline throughput scaling executor driver codegen predicate"
    ).split()
    for pdf in batches:
        ids, texts, twins = [], [], []
        for i in pdf["id"].tolist():
            rng = random.Random(1 << 20 | i)
            toks = [rng.choice(words) for _ in range(rng.randint(30, 80))]
            ids.append(2 * i)
            texts.append(" ".join(toks))
            twins.append(False)
            if rng.random() < DUP_RATE:
                mut = list(toks)
                for _ in range(max(1, len(mut) // 10)):
                    mut[rng.randrange(len(mut))] = rng.choice(words)
                ids.append(2 * i + 1)
                texts.append(" ".join(mut))
                twins.append(True)
        yield pd.DataFrame({"doc_id": ids, "text": texts, "is_twin": twins})


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.dedup import minhash_lsh_pairs

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-dedup")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if not (CACHE / "_SUCCESS").exists():
        (
            spark.range(N_DOCS)
            .repartition(64)
            .mapInPandas(
                gen_partition, "doc_id long, text string, is_twin boolean"
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE))
    n = corpus.count()
    injected = corpus.filter("is_twin").count()

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        corpus, n=3, num_hashes=16, bands=8, threshold=0.5, max_df=2000
    )
    # recalled = injected twin pairs found: twin 2i+1 pairs with base 2i
    hits = pairs.filter(
        (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") % 2 == 0)
    ).count()
    total_pairs = pairs.count()
    wall = time.time() - t0

    # connected-components grouping over the same graph: proves the
    # iterative min-label loop at ~100k-doc scale (twin pairs are
    # disjoint 2-cliques, so every group must have exactly 2 members
    # and group_id == the even base doc id)
    from ocr_spark.operators.dedup import near_dup_groups

    t0 = time.time()
    groups = near_dup_groups(
        corpus, n=3, num_hashes=16, bands=8, threshold=0.5, max_df=2000
    )
    g = groups.groupBy("group_id").count()
    n_groups = g.count()
    max_group = g.agg(F.max("count")).collect()[0][0]
    groups_wall = time.time() - t0

    # winnowing sketch on the SAME corpus: the cheap candidate path
    # (~2/(w+1) posting volume, no verify step). min_shared=3 measured
    # recall 1.0 with single-digit extra pairs at 20k; reported here at
    # full scale for the honest minhash-vs-winnow tradeoff.
    from ocr_spark.operators.sketches import winnow_near_dup_pairs

    t0 = time.time()
    wp = winnow_near_dup_pairs(
        corpus, k=4, w=4, min_shared=3, max_df=100
    )
    w_hits = wp.filter(
        (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") % 2 == 0)
    ).count()
    w_total = wp.count()
    winnow_wall = time.time() - t0

    # full verified winnow path: candidates + exact Jaccard on
    # candidate docs only (the minhash-equivalent OUTPUT at sketch cost)
    from ocr_spark.operators.sketches import winnow_verified_pairs

    t0 = time.time()
    wv = winnow_verified_pairs(
        corpus, k=4, w=4, min_shared=3, max_df=100,
        shingle_n=3, threshold=0.5, jaccard_max_df=2000,
    )
    wv_hits = wv.filter(
        (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") % 2 == 0)
    ).count()
    wv_total = wv.count()
    wv_wall = time.time() - t0

    print(
        json.dumps(
            {
                "wall_s": round(wall, 1),
                "n_docs": n,
                "injected": injected,
                "recalled": hits,
                "recall": round(hits / injected, 4),
                "extra_pairs": total_pairs - hits,
                "groups_wall_s": round(groups_wall, 1),
                "n_groups": n_groups,
                "max_group_size": max_group,
                "winnow_wall_s": round(winnow_wall, 1),
                "winnow_recall": round(w_hits / injected, 4),
                "winnow_extra_pairs": w_total - w_hits,
                "winnow_verified_wall_s": round(wv_wall, 1),
                "winnow_verified_recall": round(wv_hits / injected, 4),
                "winnow_verified_false_pairs": wv_total - wv_hits,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
