"""Pipeline-semantics tests: dedup, overrides, salting balance,
ordering contract, synth determinism (SURVEY.md §5.2.3)."""

import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.operators.relational import apply_overrides, dedup_turns
from ocr_spark.partitioning import repartition_salted, whale_conv_ids
from ocr_spark.synth import gen_transcripts


def test_dedup_duplicate_turns(spark, tiny_transcripts):
    sdf = spark.createDataFrame(tiny_transcripts)
    doubled = sdf.unionByName(sdf.limit(50))
    out = dedup_turns(doubled)
    assert out.count() == len(tiny_transcripts)


def test_override_upsert(spark, tiny_transcripts):
    from ocr_spark.extract import extract

    sdf = spark.createDataFrame(tiny_transcripts.head(200))
    ext = extract(sdf)
    ov = spark.createDataFrame(
        pd.DataFrame(
            {"conv_id": ["c00000000"], "turn_idx": [0], "text": ["MANUAL"]}
        )
    )
    out = apply_overrides(ext, ov)
    assert out.count() == ext.count()
    got = out.filter(
        (F.col("conv_id") == "c00000000") & (F.col("turn_idx") == 0)
    ).collect()[0]
    assert got.text == "MANUAL" and got.overridden
    n_over = out.filter(F.col("overridden")).count()
    assert n_over == 1


def test_whale_detection_and_salting_balance(spark):
    # one whale among minnows: without salting it fills one partition
    def conv(cid, n):
        return pd.DataFrame(
            {
                "conv_id": cid,
                "turn_idx": pd.array(range(n), dtype="int32"),
                "role": "user",
                "text": "plain text payload",
                "tool": None,
                "ts": pd.Timestamp("2026-01-01", tz="UTC"),
            }
        )

    data = pd.concat(
        [conv("whale", 400)] + [conv(f"m{i:03d}", 3) for i in range(30)]
    ).reset_index(drop=True)
    sdf = spark.createDataFrame(data)

    whales = whale_conv_ids(sdf, salt_threshold=100).collect()
    assert [w.conv_id for w in whales] == ["whale"]

    # turn-block salting: 400 turns / block size 50 = 8 distinct salt
    # keys, so the whale spreads over several partitions and no single
    # partition holds a block larger than the threshold allows
    salted = repartition_salted(sdf, 32, salt_buckets=8, salt_threshold=50)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "whale")
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(sizes) >= 4, "whale turns must spread over several partitions"
    assert max(r["count"] for r in sizes) < 400
    # minnows (3 turns, below one block) keep salt 0: fully colocated
    minnow = (
        salted.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "m000")
        .select("pid")
        .distinct()
        .count()
    )
    assert minnow == 1


def test_synth_determinism():
    a = gen_transcripts(50, seed=3, whale_lo=30, whale_hi=40)
    b = gen_transcripts(50, seed=3, whale_lo=30, whale_hi=40)
    pd.testing.assert_frame_equal(a, b)
    c = gen_transcripts(50, seed=4, whale_lo=30, whale_hi=40)
    assert not a.text.equals(c.text)


def test_skew_profile_has_whales():
    pdf = gen_transcripts(400, seed=0, whale_lo=300, whale_hi=500)
    sizes = pdf.groupby("conv_id").size()
    assert sizes.max() >= 300, "1% whale tail expected at n=400"
    assert sizes.min() >= 1 and sizes.quantile(0.5) <= 20
