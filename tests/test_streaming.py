"""Streaming extraction: incremental file-source processing with
exactly-once checkpointing matches the batch oracle per turn."""

import os

import duckdb
import pandas as pd

from ocr_spark.streaming import extract_stream, read_transcript_stream
from ocr_spark.synth import (
    gen_transcripts,
    oracle_extract,
    write_transcripts_parquet,
)


def _drain(spark, in_dir, out_dir, ckpt):
    stream = read_transcript_stream(spark, in_dir)
    q = extract_stream(stream, out_dir, ckpt, trigger_once=True)
    q.awaitTermination(120)


def test_streaming_matches_oracle_and_is_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    a = gen_transcripts(30, seed=21, whale_lo=40, whale_hi=60)
    write_transcripts_parquet(a, f"{in_dir}/batch-a.parquet")
    _drain(spark, in_dir, out_dir, ckpt)
    n_after_a = duckdb.sql(
        f"select count(*) from '{out_dir}/*.parquet'"
    ).fetchone()[0]
    assert n_after_a == len(a)

    # second batch lands; checkpoint must skip batch-a (no duplicates)
    b = gen_transcripts(20, seed=22, whale_lo=40, whale_hi=60)
    b["conv_id"] = "x" + b["conv_id"]
    write_transcripts_parquet(b, f"{in_dir}/batch-b.parquet")
    _drain(spark, in_dir, out_dir, ckpt)

    got = duckdb.sql(
        f"""select conv_id, turn_idx, text, score, error
            from '{out_dir}/*.parquet' order by conv_id, turn_idx"""
    ).df()
    assert len(got) == len(a) + len(b), "exactly-once: no dup, no loss"

    gold = oracle_extract(pd.concat([a, b], ignore_index=True))
    gold = gold[["conv_id", "turn_idx", "text", "score", "error"]]
    gold = gold.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int32")
    pd.testing.assert_frame_equal(
        gold, got.reset_index(drop=True), check_exact=False, rtol=1e-9
    )
