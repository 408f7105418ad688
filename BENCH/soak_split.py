#!/usr/bin/env python
"""Split/shard soak: hash_split + shard_assign at 2M rows.

hash_split over 400k conversation groups x 5 turns (2M rows, splits
val 1% / test 1%):
- group coherence EXACT: zero conversations straddle a split.
- key-level fractions: observed val/test key counts within 6 sigma of
  the binomial around the operator's actual threshold
  int(0.01 * 65536) / 65536 (NOT the nominal 1% — the int() floor is
  part of the contract).
- value exactness on 2,000 sampled keys vs a pure-python hashlib md5
  reference of the same interval cut.

shard_assign over 2M ids into 64 shards:
- row count preserved; every shard's positions are exactly 1..n
  (max(pos) == count(pos) == countDistinct(pos)).
- balance: max/min shard size (md5 uniformity at 31k rows/shard).
- full-order exactness for ONE shard: all of shard 0 pulled and
  compared row-for-row against a python reference that sorts by
  (md5(key#salt), key) — pins the (h, key) tiebreak and the mod-8
  bucketing end to end.

Both ops are cheap by design (split is a pure projection, shard is
one partition-by-shard window) — the soak exists to pin EXACTNESS and
uniformity at a scale where a selector-width or tiebreak bug cannot
hide, not to stress throughput.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.textops import hash_split, shard_assign

    n_convs = 400_000
    turns_per = 5
    n_docs = 2_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-split")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    res: dict = {}

    # ---- hash_split ----
    turns = (
        spark.range(n_convs * turns_per)
        .select(
            F.concat(F.lit("conv"), (F.col("id") / turns_per).cast("long"))
            .alias("conv_id"),
            (F.col("id") % turns_per).cast("int").alias("turn_idx"),
        )
        .repartition(64)
    )
    t0 = time.time()
    split = hash_split(
        turns, {"val": 0.01, "test": 0.01}, key_col="conv_id"
    )
    agg = split.groupBy("conv_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.first("split").alias("split"),
    )
    coh = agg.agg(
        F.sum((F.col("n_splits") != 1).cast("long")).alias("incoherent"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("split") == "val").cast("long")).alias("val_keys"),
        F.sum((F.col("split") == "test").cast("long")).alias("test_keys"),
    ).first()
    res["split_wall_s"] = round(time.time() - t0, 1)
    res["incoherent_groups"] = int(coh["incoherent"])
    p = int(0.01 * 65536) / 65536  # the operator's floored threshold
    mean, sd = n_convs * p, (n_convs * p * (1 - p)) ** 0.5
    res["val_keys"] = int(coh["val_keys"])
    res["test_keys"] = int(coh["test_keys"])
    res["frac_z_max"] = round(
        max(
            abs(res["val_keys"] - mean) / sd,
            abs(res["test_keys"] - mean) / sd,
        ),
        2,
    )

    # sampled python-reference exactness (same interval-cut contract)
    def py_split(key: str) -> str:
        u = int(hashlib.md5(key.encode()).hexdigest()[:4], 16)
        lo = int(0.01 * 65536)
        if u < lo:
            return "val"
        if u < 2 * lo:
            return "test"
        return "train"

    sample = (
        agg.select("conv_id", "split")
        .orderBy("conv_id")
        .limit(2000)
        .collect()
    )
    res["split_sample_mismatch"] = sum(
        1 for r in sample if py_split(r["conv_id"]) != r["split"]
    )

    # ---- shard_assign ----
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id").repartition(64)
    t0 = time.time()
    sh = shard_assign(docs, n_shards=64, key_col="doc_id", salt="s1")
    stats = (
        sh.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("pos").alias("max_pos"),
            F.countDistinct("pos").alias("n_pos"),
        )
        .collect()
    )
    res["shard_wall_s"] = round(time.time() - t0, 1)
    res["n_shards_seen"] = len(stats)
    res["rows_total"] = int(sum(r["n"] for r in stats))
    res["pos_contiguous_violations"] = sum(
        1 for r in stats if not (r["max_pos"] == r["n"] == r["n_pos"])
    )
    sizes = [r["n"] for r in stats]
    res["shard_balance_max_over_min"] = round(max(sizes) / min(sizes), 3)

    shard0 = sorted(
        sh.filter(F.col("shard") == 0).select("doc_id", "pos").collect(),
        key=lambda r: r["pos"],
    )
    ref = sorted(
        (
            hashlib.md5(f"{i}#s1".encode()).hexdigest(),
            i,
        )
        for i in range(n_docs)
        if int(hashlib.md5(f"{i}#s1".encode()).hexdigest()[:8], 16) % 64
        == 0
    )
    res["shard0_rows"] = len(shard0)
    res["shard0_order_mismatch"] = (
        sum(
            1
            for pos0, (r, (_, i)) in enumerate(zip(shard0, ref))
            if not (r["doc_id"] == i and r["pos"] == pos0 + 1)
        )
        if len(shard0) == len(ref)
        else -1
    )

    print(json.dumps(res))
    ok = (
        res["incoherent_groups"] == 0
        and res["frac_z_max"] < 6.0
        and res["split_sample_mismatch"] == 0
        and res["n_shards_seen"] == 64
        and res["rows_total"] == n_docs
        and res["pos_contiguous_violations"] == 0
        and res["shard_balance_max_over_min"] < 1.1
        and res["shard0_order_mismatch"] == 0
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
