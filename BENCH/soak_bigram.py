#!/usr/bin/env python
"""Bigram-vs-unigram LM quality-filter soak: does ``bigram_logprob``
separate scrambled gibberish from fluent text where
``unigram_logprob`` cannot?

Corpus: 100k docs of 80-120 tokens. Clean docs follow a deterministic
first-order Markov chain over a 64-word vocabulary (w_i -> w_{(i+1)%64}
with p=0.9, else uniform) — strong bigram structure, ~uniform unigram
marginal. Each GIBBERISH doc (10%) is a clean Markov doc whose tokens
are then SHUFFLED: per-doc unigram content is IDENTICAL to a clean doc
by construction, so any unigram-score separation is pure noise, while
the bigram LM sees the broken transitions.

Metric: classification accuracy of the midpoint-of-class-means
threshold, plus Cohen's d, for all three scores (JM bigram, Kneser-Ney
bigram, unigram). Pass = bigram AND KN accuracy >= 0.99, unigram
accuracy <= 0.65 (chance-ish) — the KN leg shows the heavier smoothing
keeps the same order-sensitivity at corpus scale.

Run: python BENCH/soak_bigram.py [n_docs]
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
GIB_RATE = 0.10
VOCAB = 64
CACHE = Path("/tmp/ocr_spark_bench") / f"bigram_corpus_{N_DOCS}.parquet"


def gen_partition(batches):
    import random

    import pandas as pd

    words = [f"w{i}" for i in range(VOCAB)]
    for pdf in batches:
        rows = []
        for i in pdf["id"].tolist():
            rng = random.Random(13 << 20 | i)
            n = rng.randint(80, 120)
            cur = rng.randrange(VOCAB)
            toks = []
            for _ in range(n):
                toks.append(words[cur])
                cur = (
                    (cur + 1) % VOCAB
                    if rng.random() < 0.9
                    else rng.randrange(VOCAB)
                )
            gib = rng.random() < GIB_RATE
            if gib:
                rng.shuffle(toks)  # identical unigram content, broken order
            rows.append((i, " ".join(toks), gib))
        yield pd.DataFrame(rows, columns=["doc_id", "text", "gib"])


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.textops import (
        bigram_logprob, kn_logprob, unigram_logprob,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-bigram")
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
    labels = corpus.select("doc_id", "gib")

    def stats_for(scored, col):
        j = scored.join(labels, "doc_id")
        agg = j.groupBy("gib").agg(
            F.avg(col).alias("mu"),
            F.stddev_pop(col).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        by = {r.gib: r for r in agg}
        mu_c, mu_g = by[False].mu, by[True].mu
        sd = ((by[False].sd ** 2 + by[True].sd ** 2) / 2) ** 0.5
        thr = (mu_c + mu_g) / 2
        # clean above threshold + gibberish below = correct
        acc_row = j.agg(
            F.avg(
                (
                    ((F.col(col) >= thr) & ~F.col("gib"))
                    | ((F.col(col) < thr) & F.col("gib"))
                ).cast("double")
            ).alias("acc")
        ).collect()[0]
        d = (mu_c - mu_g) / sd if sd > 0 else 0.0
        return {
            "mu_clean": round(mu_c, 4),
            "mu_gib": round(mu_g, 4),
            "cohens_d": round(d, 2),
            "accuracy": round(acc_row.acc, 4),
        }

    t0 = time.time()
    bi = stats_for(bigram_logprob(corpus), "avg_logprob2")
    t_bi = time.time() - t0
    t0 = time.time()
    un = stats_for(unigram_logprob(corpus), "avg_logprob")
    t_un = time.time() - t0
    t0 = time.time()
    kn = stats_for(kn_logprob(corpus), "avg_kn_logprob")
    t_kn = time.time() - t0

    res = {
        "n_docs": N_DOCS,
        "bigram": bi,
        "bigram_wall_s": round(t_bi, 1),
        "unigram": un,
        "unigram_wall_s": round(t_un, 1),
        "kneser_ney": kn,
        "kn_wall_s": round(t_kn, 1),
    }
    print(json.dumps(res))
    ok = (bi["accuracy"] >= 0.99 and kn["accuracy"] >= 0.99
          and un["accuracy"] <= 0.65)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
