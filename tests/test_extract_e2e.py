"""North-rule gate: per-turn equality between the Spark pipeline and the
single-process golden oracle, under stable (conv_id, turn_idx) ordering,
with row-count preservation (error rows survive)."""

import pandas as pd

from ocr_spark.extract import extract
from tests.conftest import norm_spans


def _run_spark(spark, pdf, **kw):
    sdf = spark.createDataFrame(pdf)
    res = extract(sdf, **kw)
    out = (
        res.select("conv_id", "turn_idx", "text", "spans", "score", "error")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return out


def _assert_equal(out: pd.DataFrame, gold: pd.DataFrame):
    assert len(out) == len(gold), "row count must be preserved"
    assert (out.conv_id.values == gold.conv_id.values).all()
    assert (out.turn_idx.values == gold.turn_idx.values).all()
    assert (out.text.values == gold.text.values).all(), "per-turn text equality"
    assert (out.score.values == gold.score.values).all()
    assert (out.error.values == gold.error.values).all()
    for a, b in zip(out.spans, gold.spans):
        assert norm_spans(a) == list(b or []), "per-turn span equality"


def test_pipeline_matches_oracle(spark, tiny_transcripts, tiny_golden):
    out = _run_spark(spark, tiny_transcripts)
    _assert_equal(out, tiny_golden)


def test_pipeline_matches_oracle_with_salting(
    spark, tiny_transcripts, tiny_golden
):
    out = _run_spark(
        spark, tiny_transcripts, partitions=8, salt_threshold=50, salt_buckets=4
    )
    _assert_equal(out, tiny_golden)


def test_input_order_invariance(spark, tiny_transcripts, tiny_golden):
    shuffled = tiny_transcripts.sample(frac=1.0, random_state=7).reset_index(
        drop=True
    )
    out = _run_spark(spark, shuffled, partitions=8, salt_threshold=50)
    _assert_equal(out, tiny_golden)


def test_error_rows_preserved(spark, tiny_transcripts):
    out = _run_spark(spark, tiny_transcripts)
    errs = out[out.error != ""]
    assert len(errs) > 0, "fixture must exercise the error channel"
    assert (errs.text == "").all()
    assert len(out) == len(tiny_transcripts)


def test_keep_candidates_false_drops_panel_only(
    spark, tiny_transcripts, tiny_golden
):
    # the scale knob must drop ONLY the per-extractor candidate panel;
    # final text/spans/score/error stay byte-identical
    sdf = spark.createDataFrame(tiny_transcripts)
    slim = extract(sdf, keep_candidates=False)
    assert "candidates" not in slim.columns
    out = (
        slim.select("conv_id", "turn_idx", "text", "spans", "score", "error")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    _assert_equal(out, tiny_golden)
