#!/usr/bin/env python
"""DSIR selection soak: does Gumbel-top-k importance resampling
actually concentrate on the target domain at corpus scale?

Corpus: 500k docs, 10% from a distinct "domain" vocabulary (science-y
token set), 90% generic. Target = 2,000 HELD-OUT domain-style docs
(ids disjoint from the corpus). Select k = 25,000 (half the domain
mass). A perfect selector picks only domain docs (precision 1.0);
random picking matches the 10% base rate.

Checks: precision >= 0.98, and the selection is deterministic across
two runs (same doc_id set — the md5-Gumbel reproducibility claim at
scale).

Run: python BENCH/soak_dsir.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DOMAIN_RATE = 0.10
N_TARGET = 2_000
CACHE = Path("/tmp/ocr_spark_bench") / f"dsir_corpus_{N_DOCS}.parquet"

GENERIC = (
    "spark shuffle partition arrow batch kernel vector column parquet "
    "iceberg lineage checkpoint resume transcript conversation turn "
    "extract content boilerplate density heuristic ensemble vote "
    "pipeline throughput scaling executor driver codegen predicate"
).split()
DOMAIN = (
    "protein genome enzyme catalyst molecule neuron synapse isotope "
    "quantum photon electron plasma nebula quasar mitosis ribosome "
    "antibody pathogen membrane cortex axon dendrite allele phenotype"
).split()


def gen_partition(batches):
    import random

    import pandas as pd

    for pdf in batches:
        rows = []
        for i in pdf["id"].tolist():
            rng = random.Random(17 << 20 | i)
            dom = rng.random() < DOMAIN_RATE
            words = DOMAIN if dom else GENERIC
            n = rng.randint(40, 80)
            rows.append(
                (i, " ".join(rng.choice(words) for _ in range(n)), dom)
            )
        yield pd.DataFrame(rows, columns=["doc_id", "text", "domain"])


def gen_target(batches):
    import random

    import pandas as pd

    for pdf in batches:
        rows = []
        for i in pdf["id"].tolist():
            rng = random.Random(19 << 20 | i)
            n = rng.randint(40, 80)
            rows.append(
                (
                    10_000_000 + i,
                    " ".join(rng.choice(DOMAIN) for _ in range(n)),
                )
            )
        yield pd.DataFrame(rows, columns=["doc_id", "text"])


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.textops import dsir_sample

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-dsir")
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
                gen_partition, "doc_id long, text string, domain boolean"
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE))
    target = (
        spark.range(N_TARGET)
        .repartition(8)
        .mapInPandas(gen_target, "doc_id long, text string")
    )
    k = int(N_DOCS * DOMAIN_RATE / 2)

    t0 = time.time()
    sel = dsir_sample(corpus, target, k=k).select("doc_id")
    picked = sel.join(corpus.select("doc_id", "domain"), "doc_id")
    n_dom = picked.filter("domain").count()
    wall = time.time() - t0
    ids1 = set(r.doc_id for r in sel.limit(1000).collect())
    ids2 = set(
        r.doc_id
        for r in dsir_sample(corpus, target, k=k)
        .select("doc_id")
        .limit(1000)
        .collect()
    )

    res = {
        "n_docs": N_DOCS,
        "k": k,
        "wall_s": round(wall, 1),
        "precision": round(n_dom / k, 4),
        "base_rate": DOMAIN_RATE,
        "deterministic": ids1 == ids2,
    }
    print(json.dumps(res))
    return 0 if res["precision"] >= 0.98 and res["deterministic"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
