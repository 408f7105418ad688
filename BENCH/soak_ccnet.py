#!/usr/bin/env python
"""ccnet_buckets approx-vs-exact soak at a scale where the t-digest is
ACTUALLY approximate: the sf0.01 agreement pytest runs at ~500 docs,
below approx_percentile's accuracy parameter (10k), where the sketch
degenerates to exact — here 500k scored docs exercise real centroid
merging.

Corpus: the soak_bigram Markov generator at 500k docs (cache shared).

Checks (the same contract the pytest pins, at 1000x the scale):
- agreement rate between approx (default) and exact bucket assignment
  >= 0.999;
- EVERY disagreeing doc's score lies in the closed band between the
  two modes' thresholds for the boundary it straddles (approx returns
  a dataset value near the target rank; exact interpolates — only
  docs between the two can differ);
- all three buckets are populated. (Bucket sizes are NOT asserted to
  be terciles: the 4dp-rounded scores of this Markov corpus tie
  heavily at the threshold values, and percentile bucketing with ties
  legitimately skews the split — measured head=45% here. A same-score
  class lands in one bucket by the >= rule on BOTH engines/modes, so
  agreement is unaffected.)

Also reports both modes' walls. At 500k docs the walls are comparable
and draw-order/VM-noise dominates (measured approx 12.2s vs exact
28.6s in one order, 14.9 vs 7.0 warm in the other) — the approx mode's
case is the BOUNDED AGGREGATION BUFFER at 10^9 docs, not local speed.

Run: python BENCH/soak_ccnet.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:  # tolerate re-import inside a pyspark worker (argv != CLI)
    N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
except ValueError:
    N_DOCS = 500_000
CACHE = Path("/tmp/ocr_spark_bench") / f"bigram_corpus_{N_DOCS}.parquet"


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from BENCH.soak_bigram import gen_partition
    from ocr_spark.operators.textops import ccnet_buckets, unigram_logprob

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-ccnet")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not (CACHE / "_SUCCESS").exists():
        (
            spark.range(N_DOCS)
            .repartition(64)
            .mapInPandas(
                gen_partition, "doc_id long, text string, gib boolean"
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE)).select("doc_id", "text")

    t0 = time.time()
    approx = ccnet_buckets(corpus).select(
        "doc_id", "avg_logprob", F.col("bucket").alias("b_approx")
    )
    approx = approx.localCheckpoint(eager=True)
    t_approx = time.time() - t0
    t0 = time.time()
    exact = ccnet_buckets(corpus, exact=True).select(
        "doc_id", F.col("bucket").alias("b_exact")
    )
    exact = exact.localCheckpoint(eager=True)
    t_exact = time.time() - t0

    lp = unigram_logprob(corpus)
    te = lp.agg(
        F.expr("percentile(avg_logprob, array(0.3333, 0.6667))").alias("q")
    ).collect()[0].q
    ta = lp.agg(
        F.expr(
            "approx_percentile(avg_logprob, array(0.3333, 0.6667), 10000)"
        ).alias("q")
    ).collect()[0].q
    bounds = [
        (min(round(te[i], 4), round(ta[i], 4)),
         max(round(te[i], 4), round(ta[i], 4)))
        for i in range(2)
    ]

    j = approx.join(exact, "doc_id")
    n = j.count()
    disagree = j.filter(F.col("b_approx") != F.col("b_exact"))
    n_dis = disagree.count()
    # boundary confinement: every disagreement's score within one of
    # the two threshold bands (closed-open, matching >= semantics)
    confined = disagree.filter(
        ((F.col("avg_logprob") >= bounds[0][0])
         & (F.col("avg_logprob") < bounds[0][1]))
        | ((F.col("avg_logprob") >= bounds[1][0])
           & (F.col("avg_logprob") < bounds[1][1]))
    ).count()
    hist = {
        r.b_approx: r.c
        for r in j.groupBy("b_approx").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }

    res = {
        "n_docs": n,
        "agreement": round(1 - n_dis / n, 6),
        "n_disagree": n_dis,
        "disagree_boundary_confined": confined == n_dis,
        "thresholds_exact": [round(x, 4) for x in te],
        "thresholds_approx": [round(x, 4) for x in ta],
        "approx_hist": hist,
        "approx_wall_s": round(t_approx, 1),
        "exact_wall_s": round(t_exact, 1),
    }
    print(json.dumps(res))
    ok = (
        res["agreement"] >= 0.999
        and res["disagree_boundary_confined"]
        and set(hist) == {"head", "middle", "tail"}
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
