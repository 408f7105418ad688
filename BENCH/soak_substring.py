#!/usr/bin/env python
"""Exact-substring-dedup soak (Lee et al. '21 ExactSubstr): planted
60-token spans over a 500k-document corpus, all checks EXACT.

Corpus: deterministic word-soup docs (70-110 body tokens from a 40-word
vocabulary). 10% of docs get ONE of 20 SHARED 60-token spans (distinct
marker tokens ``spK_J``) spliced at a random token position — each span
lands in ~2,500 docs, so every planted span is cross-document
duplicated and must be scrubbed from every carrier. A further 5% get a
doc-UNIQUE 60-token span (``uDOC_J``) that no other document contains —
it must survive untouched (the op's false-positive guard).

Why the checks are exact, not statistical: every planted span is
flanked by doc-UNIQUE sentinel tokens (``bDOC`` / ``eDOC``), so the
only duplicated 50-gram windows are those fully inside a shared span —
boundary windows always contain a sentinel, and body 50-grams collide
between independent docs with probability ~40^-50. (Without sentinels
the count is NOT exact, by correct ExactSubstr semantics: two carriers
of the same span that coincide on the body token flanking it share the
boundary window too — measured ~2 extra dropped tokens per carrier at
100 carriers/span over a 40-word vocabulary.) A 60-token span has
exactly 11 interior window starts whose union covers exactly the 60
span tokens, so:

- rows out == rows in (rows never dropped),
- sum(n_dropped) == 60 * n_shared_carriers EXACTLY,
- zero ``sp`` marker tokens survive anywhere,
- every unique-span doc has n_dropped == 0.

Run: python BENCH/soak_substring.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
SHARED_RATE = 0.10
UNIQUE_RATE = 0.05
N_SPANS = 20
SPAN_LEN = 60
MIN_LEN = 50
CACHE = Path("/tmp/ocr_spark_bench") / f"substring_corpus_{N_DOCS}.parquet"


def gen_partition(batches):
    import random

    import pandas as pd

    words = (
        "spark shuffle partition arrow batch kernel vector column parquet "
        "iceberg lineage checkpoint resume transcript conversation turn "
        "extract content boilerplate density heuristic ensemble vote "
        "pipeline throughput scaling executor driver codegen predicate"
    ).split()
    shared = [
        [f"sp{s}_{j}" for j in range(SPAN_LEN)] for s in range(N_SPANS)
    ]
    for pdf in batches:
        rows = []
        for i in pdf["id"].tolist():
            rng = random.Random(11 << 20 | i)
            toks = [
                rng.choice(words) for _ in range(rng.randint(70, 110))
            ]
            r = rng.random()
            kind = (
                "shared"
                if r < SHARED_RATE
                else "unique"
                if r < SHARED_RATE + UNIQUE_RATE
                else "plain"
            )
            if kind == "shared":
                span = shared[rng.randrange(N_SPANS)]
            elif kind == "unique":
                span = [f"u{i}_{j}" for j in range(SPAN_LEN)]
            else:
                span = None
            if span is not None:
                at = rng.randrange(len(toks) + 1)
                toks = (
                    toks[:at]
                    + [f"b{i}"] + span + [f"e{i}"]
                    + toks[at:]
                )
            rows.append((i, " ".join(toks), kind))
        yield pd.DataFrame(rows, columns=["doc_id", "text", "kind"])


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.dedup import substring_dedup

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-substring")
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
                gen_partition, "doc_id long, text string, kind string"
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE))
    n = corpus.count()
    n_shared = corpus.filter("kind = 'shared'").count()
    n_unique = corpus.filter("kind = 'unique'").count()

    t0 = time.time()
    out = substring_dedup(corpus, min_len=MIN_LEN).join(
        corpus.select("doc_id", "kind"), "doc_id"
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_dropped").alias("dropped"),
        F.sum(
            (F.col("text_clean").rlike(r"\bsp\d+_\d+\b")).cast("long")
        ).alias("shared_survivors"),
        F.sum(
            ((F.col("kind") == "unique") & (F.col("n_dropped") > 0)).cast(
                "long"
            )
        ).alias("unique_false_drops"),
    ).collect()[0]
    wall = time.time() - t0

    res = {
        "n_docs": n,
        "shared_carriers": n_shared,
        "unique_carriers": n_unique,
        "wall_s": round(wall, 1),
        "docs_per_s": round(n / wall),
        "rows_preserved": int(stats["rows"]) == n,
        "dropped_tokens": int(stats["dropped"]),
        "dropped_eq_expected": int(stats["dropped"]) == SPAN_LEN * n_shared,
        "shared_survivors": int(stats["shared_survivors"]),
        "unique_false_drops": int(stats["unique_false_drops"]),
    }
    print(json.dumps(res))
    ok = (
        res["rows_preserved"]
        and res["dropped_eq_expected"]
        and res["shared_survivors"] == 0
        and res["unique_false_drops"] == 0
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
