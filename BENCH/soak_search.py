#!/usr/bin/env python
"""Retrieval/corpus-statistics soak: BM25, TF-IDF keywords, unigram LM
log-prob and PMI collocations over a 500k-document corpus (100x the
sf0.1 documents table, ~40M tokens).

Corpus: deterministic word-soup docs (60-110 tokens from a 400-word
vocabulary). Planted signals make every check EXACT or cleanly
separable, not eyeballed:

- every 1000th doc gets 3 occurrences of EACH of three marker terms
  ("cryptid", "wyvern", "basilisk") that appear nowhere else ->
  (a) bm25 top-k for the markers returns ONLY planted docs with all
  three terms matched; (b) those docs' rank-1 TF-IDF keyword is a
  marker (df=500 of 500k -> idf ~6.9, beats any vocab word's ~1.9);
  (c) their unigram avg_logprob mean sits strictly below the
  unplanted mean (markers are ~1000x rarer than vocab words).
- docs with doc_id % 20 == 1 get 1-3 adjacent "neural network"
  insertions; neither word occurs alone -> the top-1 PMI bigram is
  exactly ("neural", "network") (independent vocab pairs have PMI ~0;
  the planted pair's PMI ~ ln(B / c_ab) >> 0).

Run: python BENCH/soak_search.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
MARK_MOD = 1000
PAIR_MOD = 20
MARKERS = ["cryptid", "wyvern", "basilisk"]
CACHE = Path("/tmp/ocr_spark_bench") / f"search_corpus_{N_DOCS}.parquet"


def gen_partition(batches):
    import random

    import pandas as pd

    base = [f"w{i:03d}" for i in range(400)]
    for pdf in batches:
        ids, texts, planted, paired = [], [], [], []
        for i in pdf["id"].tolist():
            rng = random.Random(11 << 22 | i)
            toks = [
                rng.choice(base) for _ in range(rng.randint(60, 110))
            ]
            is_marked = i % MARK_MOD == 0
            if is_marked:
                for m in MARKERS:
                    for _ in range(3):
                        toks.insert(rng.randrange(len(toks) + 1), m)
            has_pair = i % PAIR_MOD == 1
            if has_pair:
                for _ in range(rng.randint(1, 3)):
                    pos = rng.randrange(len(toks) + 1)
                    toks[pos:pos] = ["neural", "network"]
            ids.append(i)
            texts.append(" ".join(toks))
            planted.append(is_marked)
            paired.append(has_pair)
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "text": texts,
                "planted": planted,
                "paired": paired,
            }
        )


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.search import bm25_topk, tfidf_keywords
    from ocr_spark.operators.textops import pmi_bigrams, unigram_logprob

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-search")
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
                "doc_id long, text string, planted boolean, paired boolean",
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE))
    n = corpus.count()

    # -- BM25: markers retrieve ONLY planted docs -------------------------
    t0 = time.time()
    hits = bm25_topk(corpus, MARKERS, k=20).collect()
    t_bm25 = time.time() - t0
    bm25_ok = (
        len(hits) == 20
        and all(r.doc_id % MARK_MOD == 0 for r in hits)
        and all(r.n_terms == 3 for r in hits)
    )

    # -- TF-IDF: planted docs' top keyword is a marker ---------------------
    t0 = time.time()
    kw = tfidf_keywords(corpus, k=1)
    planted_top = (
        kw.filter((F.col("doc_id") % MARK_MOD == 0) & (F.col("rank") == 1))
        .select("doc_id", "term")
        .collect()
    )
    t_tfidf = time.time() - t0
    tfidf_ok = len(planted_top) == (n + MARK_MOD - 1) // MARK_MOD and all(
        r.term in MARKERS for r in planted_top
    )

    # -- unigram LM: rare-marker docs score strictly lower ----------------
    t0 = time.time()
    lp = unigram_logprob(corpus).join(
        corpus.select("doc_id", "planted"), "doc_id"
    )
    means = (
        lp.groupBy("planted")
        .agg(F.avg("avg_logprob").alias("m"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    t_lp = time.time() - t0
    m = {r.planted: (r.m, r.c) for r in means}
    lp_ok = (
        m[True][1] + m[False][1] == n and m[True][0] < m[False][0] - 0.05
    )

    # -- PMI: the planted adjacent pair is the top collocation ------------
    # min_count scales with the corpus: accidental marker-marker
    # adjacencies inside planted docs accumulate ~O(n_docs/1000) counts
    # (measured ~60 at 500k — past a fixed floor of 50, and with
    # c_a = c_b ~ 1500 their PMI beats the planted pair's); the planted
    # pair's count is ~n_docs/10, so n_docs/100 cleanly separates.
    t0 = time.time()
    top = pmi_bigrams(
        corpus, min_count=max(50, N_DOCS // 100), k=5
    ).collect()
    t_pmi = time.time() - t0
    pmi_ok = (
        len(top) >= 1
        and (top[0].term_a, top[0].term_b) == ("neural", "network")
        and top[0].pmi > 1.0
    )

    result = {
        "metric": "search_soak",
        "n_docs": n,
        "bm25_sec": round(t_bm25, 2),
        "bm25_docs_per_sec": round(n / t_bm25, 1),
        "bm25_exact": bm25_ok,
        "tfidf_sec": round(t_tfidf, 2),
        "tfidf_planted_top1_is_marker": tfidf_ok,
        "unigram_logprob_sec": round(t_lp, 2),
        "logprob_mean_planted": round(m[True][0], 4),
        "logprob_mean_other": round(m[False][0], 4),
        "logprob_separated": lp_ok,
        "pmi_sec": round(t_pmi, 2),
        "pmi_top1_is_planted_pair": pmi_ok,
        "ok": bool(bm25_ok and tfidf_ok and lp_ok and pmi_ok),
    }
    print(json.dumps(result))
    spark.stop()
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
