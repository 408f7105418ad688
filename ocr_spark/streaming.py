"""Structured Streaming surface for the extraction pipeline.

The reference explicitly descoped real-time ingest (CCTV streaming was
asked and rejected — /root/reference/documents/1차회의의문내용.md:6; the
product is batch photo uploads). This module exists because a complete
engine at 10^12-turn scale still needs an incremental path: new
transcript partitions land continuously, and re-running the batch job
over the full table is wasteful even with lineage resume.

Design: the SAME fused pandas UDF (ocr_spark.extract) applied to a
file-source stream. Exactly-once comes from Spark's checkpointed source
offsets + idempotent parquet sink — the streaming twin of the batch
lineage/anti-join protocol (ocr_spark.io). No aggregation state, no
watermark needed: extraction is stateless per-row, so every micro-batch
is a pure map (the cheapest possible streaming operator shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.extract import extract
from ocr_spark.schema import TRANSCRIPTS


def read_transcript_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """File-source stream over a transcripts directory (new parquet files
    are discovered per micro-batch — the Iceberg/Kafka source drops in
    behind the same schema)."""
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(
    transcripts: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
):
    """Run the extraction UDF over a streaming transcripts DataFrame.

    Returns the started StreamingQuery. ``trigger_once=True`` drains all
    available input then stops — the "incremental batch" mode (run from
    cron, process only new files, exactly-once via checkpoint).
    """
    ext = extract(transcripts)  # map-only: no partitions arg, no shuffle
    writer = (
        ext.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extract_stream_with_lineage(
    transcripts: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    lineage_dir: str,
    trigger_once: bool = False,
):
    """Streaming twin of the batch lineage protocol (observability
    parity with ``ExtractWriter``): each micro-batch writes its data
    partition idempotently (overwrite of batch_id=<n>, so a replayed
    batch after a crash rewrites rather than duplicates), then appends
    ONE lineage row (batch_id, n_turns, n_errors, committed_at) LAST —
    manifest-last, exactly like the batch writer. Read lineage with
    ``dropDuplicates(['batch_id'])``: a replayed batch may append its
    row twice, and batch_id is the dedup key (the counts are identical
    by determinism).
    """
    from pyspark.sql import functions as F

    ext = extract(transcripts)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        (
            batch_df.write.mode("overwrite").parquet(
                f"{output_dir}/batch_id={batch_id}"
            )
        )
        stats = batch_df.agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("error") != "").cast("long")).alias("n_errors"),
        ).collect()[0]
        (
            spark.createDataFrame(
                [(batch_id, stats.n_turns, stats.n_errors or 0)],
                "batch_id long, n_turns long, n_errors long",
            )
            .withColumn("committed_at", F.current_timestamp())
            .coalesce(1)
            .write.mode("append")
            .parquet(lineage_dir)
        )

    writer = (
        ext.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
