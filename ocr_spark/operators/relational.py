"""Relational operators the Spark re-expression needs (SURVEY.md §2.2).

These are thin, deliberately-shaped compositions of built-ins — the
point is the *plan* (broadcast the small side, anti-join for resume,
window for intra-conversation ordering), not the code volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def apply_overrides(extracted: DataFrame, overrides: DataFrame) -> DataFrame:
    """Manual-correction upsert (SURVEY.md O13): broadcast left join +
    coalesce — the GUI edit graft (/root/reference/README.md:28)."""
    ov = overrides.select(
        "conv_id", "turn_idx", F.col("text").alias("_override_text")
    )
    return (
        extracted.join(F.broadcast(ov), ["conv_id", "turn_idx"], "left")
        .withColumn("text", F.coalesce("_override_text", "text"))
        .withColumn(
            "overridden", F.col("_override_text").isNotNull()
        )
        .drop("_override_text")
    )


def dedup_turns(transcripts: DataFrame) -> DataFrame:
    """O2: drop duplicate (conv_id, turn_idx) rows — the reference's
    duplicate-filename dedup (documents/…2학기_8주차.md:52)."""
    return transcripts.dropDuplicates(["conv_id", "turn_idx"])


def turn_numbering(df: DataFrame) -> DataFrame:
    """Stable intra-conversation re-indexing check (window row_number
    over (conv_id) ordered by turn_idx)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("rn", F.row_number().over(w))


def resume_anti_join(
    all_units: DataFrame, committed: DataFrame, key: str
) -> DataFrame:
    """O16: units not yet committed (left_anti on the unit key)."""
    return all_units.join(committed, key, "left_anti")


def run_stats(extracted: DataFrame) -> DataFrame:
    """O17: per-run report stats — the '385 images in 4m18s' accounting
    graft (/root/reference/README.md:8)."""
    return extracted.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("error") != "").cast("long")).alias("n_errors"),
        F.round(F.avg("score"), 4).alias("avg_score"),
        F.min("conv_id").alias("conv_min"),
        F.max("conv_id").alias("conv_max"),
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    payload: dict[str, str] | None = None,
    right_id: str = "rid",
) -> DataFrame:
    """Time-series as-of join: attach to every ``left`` row the most
    recent ``right`` row with ``right.ts <= left.ts`` for the same key
    (the point-in-time lookup of market-data and feature-store joins;
    Spark has no native ASOF JOIN — DuckDB/Pandas do).

    Implementation is the union-tag + running last-non-null trick, NOT
    a range join: a theta-join on ``r.ts <= l.ts`` explodes to
    O(|L|x|R|) per key before aggregation, while this is one
    window-sort over |L|+|R| rows per key — the only shape that
    survives 10^12 rows. Right rows sort BEFORE left rows at equal
    timestamps (inclusive <= semantics), and equal-timestamp right
    rows tie-break by ``right_id`` (the later id wins), which makes
    the result total-ordered and engine-portable; the relative order
    of left rows at the same instant is irrelevant (they all see the
    same set of right rows, and left rows carry null payload).

    ``payload`` maps right-side column -> output alias. Left rows with
    no matching right row keep null payload (left-join semantics).
    """
    payload = payload or {}
    out_cols = list(payload.values())
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_rid", F.lit(None).cast("long")
    )
    for src, dst in payload.items():
        l_tag = l_tag.withColumn(dst, F.lit(None).cast(
            dict(right.dtypes)[src]
        ))
    r_tag = right.select(
        key,
        F.col(ts).alias(ts),
        F.lit(0).alias("_side"),
        F.col(right_id).cast("long").alias("_rid"),
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    )
    left_cols = [c for c in left.columns]
    u = l_tag.select(
        *left_cols, "_side", "_rid", *out_cols
    ).unionByName(
        r_tag, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(),
                 F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left_cols,
        "_side",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in out_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one key belong
    to the same session while the inter-event gap stays under
    ``gap_minutes``; a longer silence starts a new session (the
    standard web-analytics / agent-episode segmentation).

    Lag + cumulative-sum of session-start flags inside one window —
    two passes over each key partition, no self-join, no explosion.
    Returns the input plus ``session_idx`` (0-based per key).
    """
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    # exact integer microseconds (unix_micros == DuckDB epoch_us):
    # second-level casts truncate/round differently across engines on
    # sub-second timestamps. Parquet timestamps load as TIMESTAMP_NTZ,
    # which unix_micros rejects — cast via the (UTC-pinned) session
    # timezone; only gap DIFFERENCES matter, so the interpretation
    # offset cancels even off-UTC
    gap_us = gap_minutes * 60 * 1_000_000
    mu = F.unix_micros(F.col(ts).cast("timestamp"))
    is_new = (mu - F.lag(mu).over(w) > gap_us).cast("long")
    return events.withColumn(
        "session_idx",
        F.sum(F.coalesce(is_new, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact grouped quantiles (corpus inspection: length/score
    distributions per stratum). Uses Spark's exact ``percentile``
    aggregate — linear-interpolation semantics identical to ANSI
    ``percentile_cont`` / DuckDB ``quantile_cont``, so results are
    engine-portable. Exact percentile sorts within each group: right
    for bounded group counts (per-language/source stats); for
    per-document groups at 10^12 rows use approx_percentile instead
    (sketch-based, no sort) and drop the oracle equality claim.
    """
    arr = ", ".join(str(q) for q in quantiles)
    agg = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("_q"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = [
        F.round(F.element_at("_q", i + 1), 4).alias(
            f"p{str(q).replace('0.', '')}"
        )
        for i, q in enumerate(quantiles)
    ]
    return agg.select(group_col, *cols, "n")


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot diff between two corpus versions keyed by doc_id — the
    ingest-versioning primitive (what changed between crawl N and crawl
    N+1; feeds incremental re-processing and drift dashboards).

    Returns (doc_id, status) with status in added / removed / changed /
    unchanged, by content fingerprint: md5 of text, NULL text
    fingerprinting as the empty string (a doc whose text goes NULL <->
    '' therefore reads unchanged — the fingerprint policy, documented
    rather than surprising).

    Scale shape: each side reduces to a (doc_id, 16-byte fp) projection
    BEFORE the join — text never shuffles — and the FULL OUTER join
    co-partitions on doc_id (the natural bucketing key, so with
    bucketed snapshot tables this is exchange-free). doc_id is assumed
    unique per snapshot (the corpus contract).
    """
    o = old.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp_old"),
    )
    n = new.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp_new"),
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
