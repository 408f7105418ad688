"""CLI regression for the --stream incremental drain mode: the ship
surface (jobs/extract.py under spark-submit semantics, here driven as a
subprocess with PYTHONPATH so it exercises the same main())."""

import os
import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent


def _run_cli(args):
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, str(REPO / "jobs" / "extract.py"), *args],
        capture_output=True, text=True, env=env, timeout=300,
    )


def test_stream_cli_incremental_and_dedup(tmp_path):
    from ocr_spark.synth import gen_transcripts, write_transcripts_parquet

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    df = gen_transcripts(60, seed=21)
    write_transcripts_parquet(df, str(in_dir / "a.parquet"))
    out = tmp_path / "wh"

    r = _run_cli(
        ["--input", str(in_dir), "--output", str(out), "--run-id", "S",
         "--stream"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n1 = duckdb.sql(
        f"select count(*) from '{out}/stream/*.parquet'"
    ).fetchone()[0]
    assert n1 == len(df)

    # drain 2: only the new file processes (exactly-once via checkpoint)
    df2 = gen_transcripts(20, seed=22)
    write_transcripts_parquet(df2, str(in_dir / "b.parquet"))
    r = _run_cli(
        ["--input", str(in_dir), "--output", str(out), "--run-id", "S",
         "--stream"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n2 = duckdb.sql(
        f"select count(*) from '{out}/stream/*.parquet'"
    ).fetchone()[0]
    assert n2 == len(df) + len(df2)

    # watermarked dedup: a redelivered file adds zero new keys
    in2 = tmp_path / "in2"
    in2.mkdir()
    write_transcripts_parquet(df2, str(in2 / "a.parquet"))
    write_transcripts_parquet(df2, str(in2 / "a_retry.parquet"))
    out2 = tmp_path / "wh2"
    r = _run_cli(
        ["--input", str(in2), "--output", str(out2), "--run-id", "S",
         "--stream", "--stream-dedup", "1 hour"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n, d = duckdb.sql(
        f"select count(*), count(distinct (conv_id, turn_idx)) "
        f"from '{out2}/stream/*.parquet'"
    ).fetchone()
    assert n == d == len(df2)
