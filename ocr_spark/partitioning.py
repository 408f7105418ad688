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
    """conv_id-hash repartition with per-turn salting of whale convs."""
    whales = whale_conv_ids(df, salt_threshold).withColumn(
        "_is_whale", F.lit(True)
    )
    salted = (
        df.join(F.broadcast(whales), "conv_id", "left")
        .withColumn(
            SALT_COL,
            F.when(
                F.col("_is_whale").isNotNull(),
                F.pmod(F.hash("turn_idx"), F.lit(salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        .drop("_is_whale")
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
