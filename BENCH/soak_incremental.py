#!/usr/bin/env python
"""Incremental (cross-run) dedup soak: a 1M-doc committed corpus, then
a 500k-doc increment of which HALF is redelivered committed content
(ws-doubled + case-flipped under fresh ids — canonical forms equal)
and half is genuinely new. All checks EXACT.

Content is made provably collision-free across the two halves by a
doc-id-derived uid token inside every text (redelivered copies carry
the ORIGINAL doc's uid, so they collide with run-1 exactly as real
redeliveries do, while fresh docs can never collide by accident).
Tokens draw from a 100k-word synthetic vocabulary seeded per doc via
``Random(f"incr#{i}")`` (string seeding hashes the whole key). TWO
fixture bugs were caught by this soak's own flags check before the
final version — both worth remembering:
- bit-OR seed composition (``29 << 20 | i``) ALIASES for ids >= 2^20:
  201,424 "fresh" docs silently reproduced committed docs' exact token
  streams (same rng stream, only the uid token differed) and the flags
  op CORRECTLY called them near-dups of committed content — 80%
  "false"-flag rate that was actually the operator being right about a
  broken fixture. Never compose integer seeds with OR.
- a 48-word vocabulary makes the 3-gram shingle universe ~110k values,
  which concentrates minhash mins on the universe's globally smallest
  hashes and genuinely saturates the committed band-key space at 1M
  docs (~10% additional collisions beyond the seed artifact) — band
  stores need a realistic shingle universe; real corpora have one.
Redelivery
mangling is ws-doubling only (NOT case-flipping): minhash shingles
are case-sensitive by design (so is the _bands_sql oracle), so a
case-flipped redelivery is a DIFFERENT document to the near-dup
family while still an exact duplicate to the canonical fingerprint
family — both behaviors are correct, and the soak pins the shared
case.

Checks:
- incremental_exact_dedup survivors == EXACTLY the fresh half: count,
  zero redelivered fingerprints, every group n_dups == 1, keep_ids all
  in the fresh id range — via the real parquet FingerprintStore
  round-trip (commit run-1, read back, anti-join).
- incremental_minhash_flags: every redelivered doc flags
  near_dup_committed=true (ws mangling preserves shingles); the
  fresh-half false-flag rate is reported and must stay < 1% (random
  word-soup docs share few shingles; band collisions are rare but not
  impossible — candidate semantics, documented).

Run: python BENCH/soak_incremental.py [n_run1]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:  # tolerate re-import inside a pyspark worker (argv != CLI)
    N_RUN1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
except ValueError:
    N_RUN1 = 1_000_000
N_HALF = N_RUN1 // 4  # redelivered half == fresh half == 250k at 1M
CACHE = Path("/tmp/ocr_spark_bench") / f"incr_corpus_v3_{N_RUN1}.parquet"
STORE = Path("/tmp/ocr_spark_bench") / f"incr_store_{N_RUN1}"


def gen_partition(batches):
    import random

    import pandas as pd

    for pdf in batches:
        rows = []
        for i in pdf["id"].tolist():
            rng = random.Random(f"incr#{i}")
            toks = [
                f"w{rng.randrange(100_000)}"
                for _ in range(rng.randint(30, 50))
            ]
            toks.insert(rng.randrange(len(toks)), f"uid{i}")
            rows.append((i, " ".join(toks)))
        yield pd.DataFrame(rows, columns=["doc_id", "text"])


def main() -> int:
    import shutil

    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.dedup import (
        FingerprintStore,
        band_keys,
        incremental_exact_dedup,
        incremental_minhash_flags,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-incremental")
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
            spark.range(N_RUN1)
            .repartition(64)
            .mapInPandas(gen_partition, "doc_id long, text string")
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    run1 = spark.read.parquet(str(CACHE))
    shutil.rmtree(STORE, ignore_errors=True)
    store = FingerprintStore(str(STORE))

    # -- commit run 1 through the real store ------------------------------
    t0 = time.time()
    s1 = incremental_exact_dedup(
        run1, store.committed_fingerprints(spark, exclude_run="r1")
    )
    store.commit_exact(s1, "r1")
    store.commit_bands(band_keys(run1), "r1")
    t_commit = time.time() - t0

    # -- build the increment ----------------------------------------------
    redelivered = run1.filter(F.col("doc_id") < N_HALF).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.regexp_replace("text", " ", "  ").alias("text"),
    )
    fresh = (
        spark.range(N_RUN1, N_RUN1 + N_HALF)
        .repartition(32)
        .mapInPandas(gen_partition, "doc_id long, text string")
    )
    incr = redelivered.unionByName(fresh)

    # -- exact incremental dedup ------------------------------------------
    t0 = time.time()
    surv = incremental_exact_dedup(
        incr, store.committed_fingerprints(spark, exclude_run="r2")
    )
    agg = surv.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n_dups").alias("max_dups"),
        F.min("keep_id").alias("min_id"),
        F.max("keep_id").alias("max_id"),
    ).collect()[0]
    t_exact = time.time() - t0

    # -- band-candidate screening ------------------------------------------
    t0 = time.time()
    flags = incremental_minhash_flags(
        incr, store.committed_band_keys(spark, exclude_run="r2")
    )
    fagg = flags.agg(
        F.sum(
            ((F.col("doc_id") >= 10_000_000)
             & ~F.col("near_dup_committed")).cast("long")
        ).alias("redelivered_missed"),
        F.sum(
            ((F.col("doc_id") < 10_000_000)
             & F.col("near_dup_committed")).cast("long")
        ).alias("fresh_flagged"),
    ).collect()[0]
    t_flags = time.time() - t0

    res = {
        "n_run1": N_RUN1,
        "n_redelivered": N_HALF,
        "n_fresh": N_HALF,
        "commit_wall_s": round(t_commit, 1),
        "exact_wall_s": round(t_exact, 1),
        "survivors": int(agg["n"]),
        "survivors_eq_fresh": int(agg["n"]) == N_HALF,
        "max_dups": int(agg["max_dups"]),
        "keep_ids_all_fresh": agg["min_id"] >= N_RUN1
        and agg["max_id"] < N_RUN1 + N_HALF,
        "flags_wall_s": round(t_flags, 1),
        "redelivered_missed": int(fagg["redelivered_missed"]),
        "fresh_false_flag_rate": round(
            int(fagg["fresh_flagged"]) / N_HALF, 5
        ),
    }
    print(json.dumps(res))
    ok = (
        res["survivors_eq_fresh"]
        and res["max_dups"] == 1
        and res["keep_ids_all_fresh"]
        and res["redelivered_missed"] == 0
        and res["fresh_false_flag_rate"] < 0.01
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
