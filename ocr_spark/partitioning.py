"""Partitioning & skew handling (SURVEY.md §2.2 skew row, §4.3).

The extraction kernel is row-wise, so compute placement only needs
*balance*; conversation colocation matters at write/export time for the
stable (conv_id, turn_idx) ordering contract. The north rule demands
explicit conv_id-hash partitioning plus salted repartitioning for skewed
("whale") conversations:

- whales are detected with one cheap partial aggregation
  (``groupBy(conv_id).count``, map-side combined) and broadcast back,
- whale turns get ``salt = pmod(hash(turn_idx), salt_buckets)``, others
  salt 0, and the stage repartitions on (conv_id, salt),
- because whales are split across partitions, ordered exports re-sort on
  read (ordering contract lives in ``ordered`` below, not in a global
  ``orderBy`` — forbidden at 10^12 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "_salt"


def whale_conv_ids(df: DataFrame, salt_threshold: int) -> DataFrame:
    """Conversations longer than ``salt_threshold`` turns (small set)."""
    return (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_n_turns"))
        .filter(F.col("_n_turns") > salt_threshold)
        .select("conv_id")
    )


def repartition_salted(
    df: DataFrame,
    num_partitions: int,
    salt_buckets: int = 16,
    salt_threshold: int = 10_000,
) -> DataFrame:
    """conv_id-hash repartition with turn-block salting of whale convs.

    ``salt = turn_idx // salt_threshold`` — a conversation shorter than
    the threshold keeps salt 0 (fully colocated), a whale splits into
    bounded blocks of ``salt_threshold`` turns each. Unlike stats-based
    whale detection this needs NO extra aggregation job, NO broadcast
    join, and no second scan of the input — the salt is a pure projection,
    so the whole pipeline stays one shuffle — while giving the same
    per-partition bound. ``salt_buckets`` caps the number of distinct
    blocks so a 10^6-turn conversation cannot fan out into 10^2 single-use
    shuffle keys per partition at 10^12-row scale.
    """
    salted = df.withColumn(
        SALT_COL,
        F.pmod(
            (F.col("turn_idx").cast("long") / F.lit(int(salt_threshold)))
            .cast("long"),
            F.lit(int(salt_buckets)),
        ),
    )
    return salted.repartition(num_partitions, "conv_id", SALT_COL).drop(
        SALT_COL
    )


def ordered(df: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering for comparison/export.

    Within-partition sort after conv_id-hash partitioning — all turns of
    a conversation colocate, so per-partition order is globally stable
    per conversation without a cluster-wide sort.
    """
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "conv_id"
    ).sortWithinPartitions("conv_id", "turn_idx")
