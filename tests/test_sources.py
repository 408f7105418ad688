"""Multi-format transcript sources: JSONL and CSV ingest must produce
the same rows as the native parquet path (schema-enforced, no inference
scan), and ingest-dedup mirrors the duplicate-filename rule."""

import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.io import read_transcripts


def _write_all_formats(tiny_transcripts, tmp_path):
    pq = tmp_path / "pq"
    js = tmp_path / "js"
    cs = tmp_path / "cs"
    for d in (pq, js, cs):
        d.mkdir()
    from ocr_spark.synth import write_transcripts_parquet

    write_transcripts_parquet(tiny_transcripts, str(pq / "t.parquet"))
    df = tiny_transcripts.copy()
    iso = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f%z")
    df = df.assign(ts=iso)
    df.to_json(js / "t.jsonl", orient="records", lines=True)
    df.to_csv(cs / "t.csv", index=False)
    return str(pq), str(js), str(cs)


def _canon(sdf):
    pdf = sdf.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
    return pdf


def test_jsonl_and_csv_match_parquet(spark, tiny_transcripts, tmp_path):
    pq, js, cs = _write_all_formats(tiny_transcripts, tmp_path)
    base = _canon(read_transcripts(spark, pq, "parquet"))
    for path, fmt in ((js, "json"), (cs, "csv")):
        got = _canon(read_transcripts(spark, path, fmt))
        pd.testing.assert_frame_equal(got, base, check_dtype=False)


def test_orc_roundtrip_matches_parquet(spark, tiny_transcripts, tmp_path):
    """ORC source (Spark-bundled columnar, the second scale-class
    format): write the parquet rows out as ORC, read via the typed
    source, rows identical."""
    pq, _, _ = _write_all_formats(tiny_transcripts, tmp_path)
    orc_dir = str(tmp_path / "orc")
    base_df = read_transcripts(spark, pq, "parquet")
    base_df.write.orc(orc_dir)
    got = _canon(read_transcripts(spark, orc_dir, "orc"))
    pd.testing.assert_frame_equal(got, _canon(base_df), check_dtype=False)


def test_ingest_dedup_drops_duplicate_turns(spark, tiny_transcripts, tmp_path):
    d = tmp_path / "dup"
    d.mkdir()
    from ocr_spark.synth import write_transcripts_parquet

    write_transcripts_parquet(tiny_transcripts, str(d / "a.parquet"))
    write_transcripts_parquet(tiny_transcripts, str(d / "b.parquet"))
    raw = read_transcripts(spark, str(d), "parquet")
    assert raw.count() == 2 * len(tiny_transcripts)
    deduped = read_transcripts(spark, str(d), "parquet", dedup=True)
    assert deduped.count() == len(tiny_transcripts)


def test_unknown_format_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unknown transcript format"):
        read_transcripts(spark, str(tmp_path), "avro")


def test_zip_ingest_dedups_by_filename_then_rows(
    spark, tiny_transcripts, tmp_path
):
    # the reference's ZIP batch container: duplicate FILENAMES are
    # dropped (first wins) before the row-level dedup
    import zipfile

    from ocr_spark.io import ingest_zip

    df = tiny_transcripts.copy()
    iso = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f%z")
    df = df.assign(ts=iso)
    half = len(df) // 2
    a, b = df.iloc[:half], df.iloc[half:]
    p_a, p_b, p_dup = (tmp_path / n for n in ("a.jsonl", "b.jsonl", "d.jsonl"))
    a.to_json(p_a, orient="records", lines=True)
    b.to_json(p_b, orient="records", lines=True)
    b.to_json(p_dup, orient="records", lines=True)

    zp = str(tmp_path / "batch.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.write(p_a, "a.jsonl")
        z.write(p_b, "b.jsonl")
        z.write(p_dup, "sub/a.jsonl")     # duplicate FILENAME: dropped
        z.write(p_dup, "other/b.jsonl")   # duplicate FILENAME: dropped

    got = ingest_zip(
        spark, zp, fmt="jsonl", work_dir=str(tmp_path / "wz")
    )
    assert got.count() == len(df)
    assert got.select("conv_id").distinct().count() == df[
        "conv_id"
    ].nunique()


def test_bucketed_join_is_shuffle_free(spark):
    """The co-located-join layout: two tables bucketBy'd on the same
    key with the same bucket count join WITHOUT an Exchange on either
    side — the scan itself reports HashPartitioning(key). The shuffle
    is paid once at write time; every later co-bucketed join is free.
    Values round-trip exactly."""
    from pyspark.sql import functions as F

    from ocr_spark.io import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    write_bucketed(left, "bkt_left", "k", buckets=8)
    write_bucketed(right, "bkt_right", "k", buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        tree = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree, tree
        got = {r.k: (r.a, r.b) for r in j.collect()}
        assert len(got) == 1000
        assert got[7] == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_read_binary_docs_roundtrip(spark, tmp_path):
    from ocr_spark.io import read_binary_docs
    from ocr_spark.operators.multimodal import decode_media, encode_fake_media

    # write fake-media payloads as raw files (the image-dir ingest shape)
    src = spark.createDataFrame(
        [(1, "hello media world"), (2, "another body")],
        "media_id long, text string",
    )
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in encode_fake_media(src).collect()
    }
    d = tmp_path / "mediadir"
    d.mkdir()
    for mid, blob in payloads.items():
        (d / f"img_{mid}.bin").write_bytes(blob)
    (d / "ignore.txt").write_text("not media")

    docs = read_binary_docs(spark, str(d), pattern="*.bin")
    rows = docs.collect()
    assert len(rows) == 2  # glob pruned the .txt at listing time
    assert {r["n_bytes"] for r in rows} == {len(b) for b in payloads.values()}
    got = {bytes(r["payload"]) for r in rows}
    assert got == set(payloads.values())
    # deterministic id: same path -> same media_id on re-read
    again = {r["path"]: r["media_id"] for r in read_binary_docs(spark, str(d), "*.bin").collect()}
    first = {r["path"]: r["media_id"] for r in rows}
    assert again == first

    # feeds the multimodal decode directly
    meta = decode_media(
        docs.select("media_id", F.lit("image").alias("kind"), "payload")
    ).collect()
    assert len(meta) == 2
    # decode reports BODY bytes (header stripped): the original texts
    assert {m["n_bytes"] for m in meta} == {
        len("hello media world"), len("another body")
    }
    assert all(m["width"] > 0 and m["height"] > 0 for m in meta)
