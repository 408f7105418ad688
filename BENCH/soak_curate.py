#!/usr/bin/env python
"""Curation-operator soak: line-level dedup + benchmark decontamination
over a 500k-document corpus (100x the sf0.1 documents table).

Corpus: deterministic multi-line word-soup docs (4-8 lines of 8-14
words). 30% of docs get ONE of five boilerplate banner lines injected at
a random line position — the C4-style cross-document contamination
line_dedup must remove. The benchmark set for decontaminate is every
250th doc (its full text), so the expected contamination set is exactly
those docs: random 13-grams from a 40-word vocabulary never collide
between independent docs (p ~ 40^-13 per pair), which makes both checks
EXACT, not statistical.

Checks:
- line_dedup(max_df=5): output rows == corpus rows (rows never
  dropped); zero banner occurrences survive; total dropped lines ==
  total injected banners (body lines are unique corpus-wide).
- decontaminate(n=13) runs on the line_dedup-CLEANED text — the real
  pipeline order: shared boilerplate first (an 11-word banner plus two
  flanking body words forms cross-document 13-grams, so decontaminating
  the RAW corpus correctly flags thousands of banner-overlap docs —
  verified during soak development), then eval-set overlap. On cleaned
  text the flagged set == the benchmark docs exactly.

Run: python BENCH/soak_curate.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
BANNER_RATE = 0.30
BENCH_MOD = 250
CACHE = Path("/tmp/ocr_spark_bench") / f"curate_corpus_{N_DOCS}.parquet"

BANNERS = [
    "subscribe to our newsletter for weekly updates and exclusive offers",
    "all rights reserved unauthorized reproduction strictly prohibited",
    "accept cookies to continue browsing this site with personalization",
    "follow us on social media for the latest announcements and news",
    "sign in to your account to unlock premium member only features",
]


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
        ids, texts, has_banner = [], [], []
        for i in pdf["id"].tolist():
            rng = random.Random(7 << 20 | i)
            lines = [
                " ".join(
                    rng.choice(words) for _ in range(rng.randint(8, 14))
                )
                for _ in range(rng.randint(4, 8))
            ]
            banner = rng.random() < BANNER_RATE
            if banner:
                lines.insert(
                    rng.randrange(len(lines) + 1),
                    BANNERS[rng.randrange(len(BANNERS))],
                )
            ids.append(i)
            texts.append("\n".join(lines))
            has_banner.append(banner)
        yield pd.DataFrame(
            {"doc_id": ids, "text": texts, "has_banner": has_banner}
        )


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.dedup import decontaminate, line_dedup

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-curate")
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
                gen_partition,
                "doc_id long, text string, has_banner boolean",
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE))
    n = corpus.count()
    n_banners = corpus.filter("has_banner").count()

    # -- line-level dedup ------------------------------------------------
    t0 = time.time()
    cleaned = line_dedup(corpus, max_df=5)
    banner_like = " OR ".join(
        f"text_clean LIKE '%{b.split()[0]} {b.split()[1]} {b.split()[2]}%'"
        for b in BANNERS
    )
    stats = cleaned.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_dropped").alias("dropped"),
        F.sum(F.expr(f"CASE WHEN {banner_like} THEN 1 ELSE 0 END")).alias(
            "banner_survivors"
        ),
    ).collect()[0]
    t_line = time.time() - t0

    # -- decontamination over the cleaned corpus ---------------------------
    clean_corpus = cleaned.select(
        "doc_id", F.col("text_clean").alias("text")
    )
    bench = clean_corpus.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    n_bench = bench.count()
    t0 = time.time()
    flagged = (
        decontaminate(clean_corpus, bench, n=13)
        .filter("contaminated")
        .select("doc_id")
    )
    n_flagged = flagged.count()
    flagged_non_bench = flagged.filter(
        F.col("doc_id") % BENCH_MOD != 0
    ).count()
    t_decon = time.time() - t0

    out = {
        "n_docs": n,
        "injected_banners": n_banners,
        "line_dedup_wall_s": round(t_line, 1),
        "rows_preserved": int(stats["rows"]) == n,
        "dropped_lines": int(stats["dropped"]),
        "dropped_eq_injected": int(stats["dropped"]) == n_banners,
        "banner_survivors": int(stats["banner_survivors"]),
        "n_bench": n_bench,
        "decontaminate_wall_s": round(t_decon, 1),
        "flagged": n_flagged,
        "flagged_eq_bench": n_flagged == n_bench,
        "false_flags": flagged_non_bench,
    }
    print(json.dumps(out))
    ok = (
        out["rows_preserved"]
        and out["dropped_eq_injected"]
        and out["banner_survivors"] == 0
        and out["flagged_eq_bench"]
        and out["false_flags"] == 0
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
