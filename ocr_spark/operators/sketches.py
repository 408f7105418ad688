"""Cardinality sketches: KMV (k-minimum-values) distinct counting.

The bounded-memory answer to "how many distinct tokens / urls / users
per group" at 100 TB, where an exact count-distinct shuffles the full
key set. KMV (Bar-Yossef et al. RANDOM '02; Beyer et al. SIGMOD '07's
unbiased estimator) keeps only the k smallest hash values per group:
if the k-th smallest of n uniform hashes lands at u_k, then
n ≈ (k-1)/u_k.

KMV is chosen over HyperLogLog deliberately: with a fixed hash (md5)
the sketch is fully DETERMINISTIC, so the estimate is bit-reproducible
across engines and the operator sits under the same DuckDB value-
equality gate as every exact operator — an approximate operator with
an exact oracle. (HLL register layouts differ per implementation;
Spark's and DuckDB's approx_count_distinct values can never
hash-match.)

Plan shape: distinct (group, term) — one hash-agg over the token
stream — then the k-th smallest hash per group via a bounded window
over the VOCABULARY-sized distinct relation (not the corpus), plus a
per-group exact count for the n < k fallback. At extreme group counts
a bounded-heap UDAF would replace the window; the declarative form
keeps the whole operator inside Catalyst and is exact for the
vocabulary-sized relations this engine's gates run at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_spark.operators.textops import TOKENS_LC, _ensure_parallelism

# 2^32 as a double: the 8-hex-digit md5 prefix maps to [0, 1).
_TWO32 = 4294967296.0


def kmv_distinct_tokens(
    df: DataFrame, k: int = 8, group_col: str = "source"
) -> DataFrame:
    """Per-group distinct-token estimate via a k-minimum-values sketch.

    Returns (group, n_exact, est_distinct): ``n_exact`` is the true
    per-group distinct count (cheap at gate scale; at 100 TB you would
    keep only the sketch), ``est_distinct`` the KMV estimate — the
    unbiased (k-1)/u_k when the group has ≥ k distinct values, else the
    exact count (the standard small-set convention: with fewer than k
    values the sketch IS the set).

    u comes from the first 8 hex digits of md5(term) scaled by 2^-32 —
    engine-portable bit-for-bit (mirrored in the DuckDB oracle with
    hex-digit arithmetic). Ties are impossible in practice (distinct
    terms, 32-bit prefixes) but the window still orders (u, term) so
    the k-th row is deterministic even under a collision.
    """
    toks = _ensure_parallelism(df).select(
        F.col(group_col).alias("grp"),
        F.explode(F.expr(TOKENS_LC)).alias("term"),
    ).filter(F.col("term") != "")
    d = toks.distinct().withColumn(
        "u",
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
        / F.lit(_TWO32),
    )
    counts = d.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.partitionBy("grp").orderBy(
        F.col("u").asc(), F.col("term").asc()
    )
    kth = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select("grp", "u")
    )
    return (
        counts.join(kth, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            F.when(F.col("n_exact") < k, F.col("n_exact").cast("double"))
            .otherwise(F.round(F.lit(float(k - 1)) / F.col("u"), 4))
            .alias("est_distinct"),
        )
    )
