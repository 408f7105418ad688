#!/usr/bin/env python
"""Conversation-operator soak: whole-conversation dedup + greedy
conversation packing over ~1M turns (the graft's transcript payload at
scale), all checks EXACT.

Corpus: 60k conversations of 5-25 turns (10-60 word-soup tokens per
turn). 5% of conversations are DUPLICATES of another conversation —
same turn sequence with whitespace doubled and case flipped (canonical
forms equal), under a fresh conv_id.

Checks:
- conv_dedup: groups with n_dups == 2 are EXACTLY the planted pairs;
  no group exceeds 2 (independent word-soup conversations never
  collide); sum(n_dups) == total conversations.
- pack_conversations(max_tokens=256) invariants over every chunk:
  (a) no chunk exceeds 256 tokens unless it is a single oversized
      turn (none exist here — turns are <= 60 tokens, so the bound is
      strict),
  (b) chunk indices per conversation are contiguous from 0,
  (c) chunk_idx is non-decreasing in turn order (turn order
      preserved),
  (d) greedy tightness: for every chunk k>0, the first turn of chunk
      k would NOT have fit in chunk k-1 (fill_{k-1} + n > 256) —
      pinning that the fold is actually greedy, not merely feasible.
- whale path: ONE planted 100k-turn conversation routed through the
  linear mapInPandas fold (> whale_turns) packs in bounded time with
  chunk count EXACTLY equal to a pure-Python greedy simulation, plus
  all four invariants above.

Run: python BENCH/soak_conv.py [n_convs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
DUP_RATE = 0.05
MAX_TOKENS = 256
CACHE = Path("/tmp/ocr_spark_bench") / f"conv_corpus_{N_CONVS}.parquet"


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
        rows = []
        for c in pdf["id"].tolist():
            rng = random.Random(23 << 20 | c)
            turns = [
                " ".join(
                    rng.choice(words) for _ in range(rng.randint(10, 60))
                )
                for _ in range(rng.randint(5, 25))
            ]
            for i, t in enumerate(turns):
                rows.append((c, i, t, False))
            if rng.random() < DUP_RATE:
                # duplicate under a fresh id: ws doubled + case flipped
                for i, t in enumerate(turns):
                    rows.append(
                        (
                            10_000_000 + c,
                            i,
                            t.upper().replace(" ", "  "),
                            True,
                        )
                    )
        yield pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "text", "is_dup"]
        )


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.dedup import conv_dedup
    from ocr_spark.operators.textops import pack_conversations

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-conv")
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
            spark.range(N_CONVS)
            .repartition(64)
            .mapInPandas(
                gen_partition,
                "conv_id long, turn_idx long, text string, is_dup boolean",
            )
            .write.mode("overwrite")
            .parquet(str(CACHE))
        )
    corpus = spark.read.parquet(str(CACHE))
    n_turns = corpus.count()
    n_convs = corpus.select("conv_id").distinct().count()
    n_planted = (
        corpus.filter("is_dup").select("conv_id").distinct().count()
    )

    # -- conv_dedup ------------------------------------------------------
    t0 = time.time()
    groups = conv_dedup(corpus)
    agg = groups.agg(
        F.sum("n_dups").alias("total"),
        F.sum((F.col("n_dups") == 2).cast("long")).alias("pairs"),
        F.max("n_dups").alias("max_group"),
    ).collect()[0]
    t_dedup = time.time() - t0

    # -- pack_conversations invariants -----------------------------------
    from pyspark.sql import Window

    def pack_invariants(packed, max_tokens):
        chunks = packed.groupBy("conv_id", "chunk_idx").agg(
            F.sum("n_tokens").alias("fill"),
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.min(F.struct("turn_idx", "n_tokens")).alias("ft"),
        )
        oversize = chunks.filter(
            (F.col("fill") > max_tokens) & (F.col("n_turns") > 1)
        ).count()
        contig = (
            chunks.groupBy("conv_id")
            .agg(
                F.max("chunk_idx").alias("mx"),
                F.count(F.lit(1)).alias("n"),
                F.min("chunk_idx").alias("mn"),
            )
            .filter(
                (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
            )
            .count()
        )
        # order preserved: within a conv, chunk_idx must be
        # non-decreasing in turn_idx
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        disorder = (
            packed.withColumn("prev", F.lag("chunk_idx").over(w))
            .filter(
                F.col("prev").isNotNull()
                & (F.col("chunk_idx") < F.col("prev"))
            )
            .count()
        )
        # greedy tightness: first turn of chunk k>0 must NOT fit in k-1
        prev_fill = chunks.select(
            "conv_id",
            (F.col("chunk_idx") + 1).alias("chunk_idx"),
            F.col("fill").alias("prev_fill"),
        )
        slack = (
            chunks.filter(F.col("chunk_idx") > 0)
            .join(prev_fill, ["conv_id", "chunk_idx"])
            .filter(
                F.col("prev_fill") + F.col("ft.n_tokens") <= max_tokens
            )
            .count()
        )
        return oversize, contig, disorder, slack

    t0 = time.time()
    packed = pack_conversations(corpus, max_tokens=MAX_TOKENS)
    oversize, contig, disorder, slack = pack_invariants(packed, MAX_TOKENS)
    t_pack = time.time() - t0

    # -- whale path: ONE planted 100k-turn conversation ------------------
    # routes through the linear mapInPandas fold (turns > whale_turns);
    # the in-row fold would copy ~5e9 accumulator ints here. Expected
    # chunk count is simulated exactly in Python, so the check is
    # EXACT, not just invariant-based.
    W_TURNS = 100_000
    t0 = time.time()
    whale = spark.range(W_TURNS).select(
        F.lit(99_999_999).alias("conv_id"),
        F.col("id").alias("turn_idx"),
        F.array_join(
            F.array_repeat(F.lit("w"), (1 + F.col("id") % 13).cast("int")),
            " ",
        ).alias("text"),
    )
    wpacked = pack_conversations(whale, max_tokens=MAX_TOKENS)
    w_chunks = wpacked.agg(
        F.max("chunk_idx").alias("mx"),
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("toks"),
    ).collect()[0]
    wo, wc, wd, ws_ = pack_invariants(wpacked, MAX_TOKENS)
    t_whale = time.time() - t0
    chunk, fill = 0, 0
    for i in range(W_TURNS):
        n = 1 + i % 13
        if fill > 0 and fill + n > MAX_TOKENS:
            chunk, fill = chunk + 1, n
        else:
            fill += n
    whale_ok = (
        int(w_chunks["mx"]) == chunk
        and int(w_chunks["rows"]) == W_TURNS
        and int(w_chunks["toks"]) == sum(1 + i % 13 for i in range(W_TURNS))
        and (wo, wc, wd, ws_) == (0, 0, 0, 0)
    )

    res = {
        "n_turns": n_turns,
        "n_convs": n_convs,
        "planted_dups": n_planted,
        "dedup_wall_s": round(t_dedup, 1),
        "dup_pairs_found": int(agg["pairs"]),
        "pairs_eq_planted": int(agg["pairs"]) == n_planted,
        "max_group": int(agg["max_group"]),
        "total_eq_convs": int(agg["total"]) == n_convs,
        "pack_wall_s": round(t_pack, 1),
        "oversized_chunks": oversize,
        "non_contiguous_convs": contig,
        "order_violations": disorder,
        "greedy_slack_violations": slack,
        "whale_turns": W_TURNS,
        "whale_wall_s": round(t_whale, 1),
        "whale_chunks": int(w_chunks["mx"]) + 1,
        "whale_exact_ok": whale_ok,
    }
    print(json.dumps(res))
    ok = (
        res["pairs_eq_planted"]
        and res["max_group"] == 2
        and res["total_eq_convs"]
        and res["oversized_chunks"] == 0
        and res["non_contiguous_convs"] == 0
        and res["order_violations"] == 0
        and res["greedy_slack_violations"] == 0
        and res["whale_exact_ok"]
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
