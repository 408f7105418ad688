#!/usr/bin/env python
"""Naive Bayes quality-classifier soak: does ``nb_quality`` learn to
separate shuffled-token gibberish from fluent text from a small
labeled sample, scored on HELD-OUT docs?

Corpus: identical generator (and cache) to ``soak_bigram.py`` — 100k
docs of 80-120 tokens over a 64-word vocabulary; clean docs follow a
first-order Markov chain (strong bigram structure), 10% are shuffled
copies with IDENTICAL per-doc unigram content, so separation must come
from the hashed BIGRAM features, exactly the signal the bigram-LM soak
isolates — but here learned from labels instead of corpus-LM scoring.

Protocol: train on the 10% of docs with doc_id % 10 == 0 (clean ones
as the positive class, gibberish as negative — realistic class
imbalance ~9:1, so the learned prior shifts the threshold), score the
held-out 90%, classify at log_odds >= 0.

Metric: held-out accuracy + Cohen's d between class score means
(the soak_bigram methodology). Pass = accuracy >= 0.99.

Run: python BENCH/soak_nb.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:  # tolerate re-import inside a pyspark worker (argv != CLI)
    N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
except ValueError:
    N_DOCS = 100_000
CACHE = Path("/tmp/ocr_spark_bench") / f"bigram_corpus_{N_DOCS}.parquet"


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from BENCH.soak_bigram import gen_partition
    from ocr_spark.operators.textops import nb_quality

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-nb")
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
    corpus = spark.read.parquet(str(CACHE))
    train = corpus.filter(F.col("doc_id") % 10 == 0)
    held = corpus.filter(F.col("doc_id") % 10 != 0)
    pos = train.filter(~F.col("gib")).select("doc_id", "text")
    neg = train.filter(F.col("gib")).select("doc_id", "text")

    t0 = time.time()
    scored = nb_quality(held.select("doc_id", "text"), pos, neg)
    j = scored.join(held.select("doc_id", "gib"), "doc_id")
    agg = j.groupBy("gib").agg(
        F.avg("log_odds").alias("mu"),
        F.stddev_pop("log_odds").alias("sd"),
        F.count(F.lit(1)).alias("n"),
        F.avg(
            (F.col("pred_clean") != F.col("gib")).cast("double")
        ).alias("acc"),
    ).collect()
    wall = time.time() - t0
    by = {r.gib: r for r in agg}
    mu_c, mu_g = by[False].mu, by[True].mu
    sd = ((by[False].sd ** 2 + by[True].sd ** 2) / 2) ** 0.5
    n_c, n_g = by[False].n, by[True].n
    acc = (by[False].acc * n_c + by[True].acc * n_g) / (n_c + n_g)

    res = {
        "n_docs": N_DOCS,
        "n_train_pos": pos.count(),
        "n_train_neg": neg.count(),
        "n_heldout": n_c + n_g,
        "mu_clean": round(mu_c, 2),
        "mu_gib": round(mu_g, 2),
        "cohens_d": round((mu_c - mu_g) / sd, 2) if sd > 0 else 0.0,
        "heldout_accuracy": round(acc, 4),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(res))
    return 0 if res["heldout_accuracy"] >= 0.99 else 1


if __name__ == "__main__":
    raise SystemExit(main())
