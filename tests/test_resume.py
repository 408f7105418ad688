"""Checkpoint/resume semantics (O15/O16): manifest-last commits,
crash-injection idempotence, reset."""

import pandas as pd
import pytest

from ocr_spark.io import ExtractWriter


@pytest.fixture()
def writer(tmp_path):
    return ExtractWriter(str(tmp_path / "wh"))


def _final(spark, w):
    return (
        w.read_ordered(spark)
        .select("conv_id", "turn_idx", "text", "error")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_crash_then_resume_is_identical(
    spark, tiny_transcripts, tiny_golden, writer, tmp_path
):
    sdf = spark.createDataFrame(tiny_transcripts)
    with pytest.raises(RuntimeError, match="injected crash"):
        writer.run(spark, sdf, "r1", n_buckets=8, group_size=2,
                   fail_after_groups=2)
    partial = writer.committed_buckets(spark, "r1")
    assert 0 < len(partial) < 8, "crash must leave a partial commit"

    resumed = writer.run(spark, sdf, "r1", n_buckets=8, group_size=2)
    assert sorted(partial | set(resumed)) == list(range(8))

    out = _final(spark, writer)
    assert len(out) == len(tiny_golden)
    assert (out.text.values == tiny_golden.text.values).all()


def test_rerun_is_noop(spark, tiny_transcripts, writer):
    sdf = spark.createDataFrame(tiny_transcripts)
    writer.run(spark, sdf, "r1", n_buckets=4, group_size=4)
    again = writer.run(spark, sdf, "r1", n_buckets=4, group_size=4)
    assert again == []


def test_reset_forgets_commits(spark, tiny_transcripts, writer):
    sdf = spark.createDataFrame(tiny_transcripts)
    writer.run(spark, sdf, "r1", n_buckets=4, group_size=4)
    writer.reset("r1")
    assert writer.committed_buckets(spark, "r1") == set()
    redone = writer.run(spark, sdf, "r1", n_buckets=4, group_size=4)
    assert sorted(redone) == [0, 1, 2, 3]
    # overwrite is idempotent: row count unchanged after full redo
    assert writer.read(spark).count() == len(tiny_transcripts)


def test_lineage_counters(spark, tiny_transcripts, tiny_golden, writer):
    sdf = spark.createDataFrame(tiny_transcripts)
    writer.run(spark, sdf, "r1", n_buckets=4, group_size=4)
    lin = writer.lineage(spark).toPandas()
    assert len(lin) == 4
    assert lin.n_turns.sum() == len(tiny_transcripts)
    assert lin.n_errors.sum() == int((tiny_golden.error != "").sum())
    assert (lin.run_id == "r1").all()


def test_run_stats_report(spark, tiny_transcripts, tiny_golden, writer):
    sdf = spark.createDataFrame(tiny_transcripts)
    writer.run(spark, sdf, "r2", n_buckets=4, group_size=2)
    stats = writer.run_stats(spark).filter("run_id = 'r2'").collect()[0]
    assert stats.n_turns == len(tiny_transcripts)
    assert stats.n_errors == int((tiny_golden.error != "").sum())
    assert stats.n_buckets == 4
    assert stats.first_commit <= stats.last_commit
