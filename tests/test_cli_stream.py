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


def test_cli_fingerprint_store_cross_run_dedup(tmp_path):
    """--fingerprint-store: run R2 drops turns whose content R1
    committed, extracts only the genuinely new rows, and re-running R2
    (--reset, same inputs) is idempotent because a run dedups against
    every run except itself."""
    from ocr_spark.synth import gen_transcripts, write_transcripts_parquet

    in1 = tmp_path / "in1"
    in1.mkdir()
    a = gen_transcripts(30, seed=31)
    write_transcripts_parquet(a, str(in1 / "a.parquet"))
    wh1, wh2 = tmp_path / "wh1", tmp_path / "wh2"
    fps = str(tmp_path / "fps")

    r = _run_cli(
        ["--input", str(in1), "--output", str(wh1), "--run-id", "R1",
         "--buckets", "4", "--group-size", "4",
         "--fingerprint-store", fps]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n1 = duckdb.sql(
        f"select count(*) from '{wh1}/extracted/**/*.parquet'"
    ).fetchone()[0]
    assert n1 == len(a)

    # run 2: all of a redelivered (fresh conv ids — content-level
    # dedup must catch them anyway) + genuinely new conversations
    in2 = tmp_path / "in2"
    in2.mkdir()
    redelivered = a.copy()
    redelivered["conv_id"] = "re" + redelivered["conv_id"]
    b = gen_transcripts(10, seed=32)
    b["conv_id"] = "nx" + b["conv_id"]
    write_transcripts_parquet(redelivered, str(in2 / "r.parquet"))
    write_transcripts_parquet(b, str(in2 / "b.parquet"))
    r = _run_cli(
        ["--input", str(in2), "--output", str(wh2), "--run-id", "R2",
         "--buckets", "4", "--group-size", "4",
         "--fingerprint-store", fps]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got2 = duckdb.sql(
        f"select count(*), count(distinct conv_id) "
        f"from '{wh2}/extracted/**/*.parquet'"
    ).fetchone()
    # only rows whose TEXT content R1 didn't commit survive: every b
    # row (fresh seed) plus any redelivered turn whose text happens to
    # be corpus-unique... content equality means redelivered rows with
    # text seen in run 1 all drop; seed-31 and seed-32 corpora are
    # disjoint in conv ids so assert via conv prefixes instead
    surv_prefix = duckdb.sql(
        f"select distinct substr(conv_id, 1, 2) "
        f"from '{wh2}/extracted/**/*.parquet'"
    ).df()
    assert set(surv_prefix.iloc[:, 0]) == {"nx"}, "redelivered content dropped"
    # expected survivors: b rows whose canonical text run 1 did NOT
    # commit (the synthetic corpora collide on a handful of texts —
    # content-level dedup must drop those too); NULL-text rows always
    # survive (NULL fingerprints never match an anti-join key).
    # Canonicalization via the oracle-convention DuckDB expression
    # (ASCII \s, same as Java regex — python re's unicode \s differs)
    con = duckdb.connect()
    con.register("ta", a)
    con.register("tb", b)
    expect = con.sql(
        """
        select count(*) from tb where text is null or
            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
            not in (
                select md5(regexp_replace(lower(trim(text)), '\\s+',
                                          ' ', 'g'))
                from ta where text is not null
            )
        """
    ).fetchone()[0]
    assert got2[0] == expect

    # idempotent replay of R2: same inputs, --reset, same store
    r = _run_cli(
        ["--input", str(in2), "--output", str(wh2), "--run-id", "R2",
         "--buckets", "4", "--group-size", "4", "--reset",
         "--fingerprint-store", fps]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n2b = duckdb.sql(
        f"select count(*) from '{wh2}/extracted/**/*.parquet'"
    ).fetchone()[0]
    assert n2b == expect, "replay idempotent"
    n_store = duckdb.sql(
        f"select count(distinct fingerprint) from '{fps}/exact/**/*.parquet'"
    ).fetchone()[0]
    assert n_store > 0


def test_stream_cli_fingerprint_store(tmp_path):
    """--stream --fingerprint-store: drain 1 extracts everything and
    commits its content fingerprints; a second run-id draining a
    redelivery of the same content (fresh conv ids, fresh files, fresh
    checkpoint) extracts zero rows via the store anti-join."""
    from ocr_spark.synth import gen_transcripts, write_transcripts_parquet

    in1 = tmp_path / "in1"
    in1.mkdir()
    a = gen_transcripts(20, seed=41)
    write_transcripts_parquet(a, str(in1 / "a.parquet"))
    fps = str(tmp_path / "fps")
    wh1, wh2 = tmp_path / "wh1", tmp_path / "wh2"

    r = _run_cli(
        ["--input", str(in1), "--output", str(wh1), "--run-id", "S1",
         "--stream", "--fingerprint-store", fps]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n1 = duckdb.sql(
        f"select count(*) from '{wh1}/stream/*.parquet'"
    ).fetchone()[0]
    assert n1 == len(a)

    in2 = tmp_path / "in2"
    in2.mkdir()
    b = a.copy()
    b["conv_id"] = "re" + b["conv_id"]
    write_transcripts_parquet(b, str(in2 / "b.parquet"))
    r = _run_cli(
        ["--input", str(in2), "--output", str(wh2), "--run-id", "S2",
         "--stream", "--fingerprint-store", fps]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import glob

    assert not glob.glob(f"{wh2}/stream/*.parquet") or duckdb.sql(
        f"select count(*) from '{wh2}/stream/*.parquet'"
    ).fetchone()[0] == 0


def test_stream_cli_rejects_both_dedup_policies(tmp_path):
    r = _run_cli(
        ["--input", "x", "--output", "y", "--run-id", "Z", "--stream",
         "--stream-dedup", "1 hour", "--fingerprint-store", "s"]
    )
    assert r.returncode != 0
    assert "pick one" in r.stderr
