"""Focused pins for the r06 optimization rewrites (review findings):

- the vectorized k-means assignment fast path must agree with the
  expression path on every edge-input class it routes (and route the
  classes it cannot reproduce — NULL / wrong width / NaN / Inf — to
  the expression path);
- the simhash fingerprint-group pair expansion must produce exactly
  the doc-level pair set, including when a same-fingerprint group is
  larger than the within-expansion block size.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_assign_fast_path_matches_expression_on_edge_inputs(spark):
    from ocr_spark.operators.clustering import _assign, _assign_expr
    from ocr_spark.operators.similarity import _norm_expr

    # d = 17 > _UNROLL_MAX_DIMS so the norm/dot use the lambda form, as
    # every production caller at d=64 does (the unrolled element_at
    # form raises under ANSI on short arrays — pre-existing, unrelated)
    d = 17

    def vec(*head):
        return list(head) + [0.0] * (d - len(head))

    rows = [
        (0, vec(1.0)),
        (1, vec(0.0, 1.0)),
        (2, vec(0.5, 0.5, 0.1, -0.2)),
        (3, None),                          # NULL embedding
        (4, [1.0, 2.0]),                    # wrong width
        (5, vec(float("nan"), 1.0)),        # NaN element
        (6, vec(float("inf"), 1.0)),        # Inf element
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).withColumn("nrm", _norm_expr("embedding", d))
    cents = [(0, vec(1.0, 0.1)), (1, vec(0.0, 1.0, 0.1))]

    def norm(df):
        out = {}
        for r in df.collect():
            c = r.cos
            out[r.vec_id] = (
                r.cid, "nan" if c is not None and c != c else c
            )
        return out

    assert norm(_assign(emb, cents, d)) == norm(
        _assign_expr(emb, cents, d)
    )


def test_assign_routes_zero_norm_to_expression_semantics(spark):
    # zero-norm vectors divide by zero; under ANSI sessions both paths
    # must fail loudly (the fast path routes them to the expression)
    from ocr_spark.operators.clustering import _assign
    from ocr_spark.operators.similarity import _norm_expr

    d = 17
    z = [0.0] * d
    one = [1.0] + [0.0] * (d - 1)
    emb = spark.createDataFrame(
        [(0, z), (1, one)], "vec_id long, embedding array<float>"
    ).withColumn("nrm", _norm_expr("embedding", d))
    cents = [(0, one)]
    ansi = spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = _assign(emb, cents, d)
    if ansi:
        with pytest.raises(Exception):
            df.collect()
    else:
        out = {r.vec_id: r.cid for r in df.collect()}
        assert out[1] == 0


def test_simhash_pairs_within_group_larger_than_block(spark):
    # 1,100 identical docs (> the 1,024-row within-expansion block)
    # plus one unrelated doc: every identical pair must appear exactly
    # once at hamming 0 and nothing else pairs
    from ocr_spark.operators.dedup import simhash_hamming_pairs

    n = 1100
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(n)) + [10_000],
                "text": ["alpha beta gamma delta epsilon"] * n
                + ["zeta eta theta iota kappa lambda mu nu xi"],
            }
        )
    )
    pairs = simhash_hamming_pairs(
        docs, bits=64, bands=4, max_hamming=3
    )
    got = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("hamming")).alias("h"),
        F.count(F.when(F.col("doc_a") < F.col("doc_b"), 1)).alias(
            "ordered"
        ),
        F.count_distinct("doc_a", "doc_b").alias("uniq"),
    ).collect()[0]
    expect = n * (n - 1) // 2
    assert got.n == expect, got
    assert got.uniq == expect  # each unordered pair exactly once
    assert got.ordered == expect
    assert got.h == 0
