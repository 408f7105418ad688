"""cms_heavy_hitters + zipf_fit: reference equality and properties."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from ocr_spark.operators.sketches import cms_heavy_hitters
from ocr_spark.operators.textops import zipf_fit


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _bucket(r: int, term: str, width: int) -> int:
    return (
        int(hashlib.md5(f"{r}|{term}".encode()).hexdigest()[:8], 16)
        % width
    )


def _ref_cms(texts, depth, width, k):
    tf = Counter(
        t for x in texts for t in x.strip().lower().split() if t
    )
    sketch: Counter = Counter()
    for term, c in tf.items():
        for r in range(depth):
            sketch[(r, _bucket(r, term, width))] += c
    est = {
        term: min(sketch[(r, _bucket(r, term, width))] for r in range(depth))
        for term in tf
    }
    top = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(term, e, tf[term]) for term, e in top]


TEXTS = [
    "the cat sat on the mat",
    "the dog ate the cat food",
    "a cat and a dog and a mat",
    "the the the dog dog mat",
]


def test_cms_matches_reference_with_collisions(spark):
    got = sorted(
        tuple(r)
        for r in cms_heavy_hitters(
            _docs(spark, TEXTS), depth=2, width=4, k=50
        ).collect()
    )
    assert got == sorted(_ref_cms(TEXTS, 2, 4, 50))


def test_cms_never_underestimates_and_collides_when_narrow(spark):
    rows = cms_heavy_hitters(
        _docs(spark, TEXTS), depth=2, width=4, k=50
    ).collect()
    assert all(r["est"] >= r["n_exact"] for r in rows)
    # 11 distinct terms into 4 buckets: some collision must inflate
    assert any(r["est"] > r["n_exact"] for r in rows)


def test_cms_wide_sketch_is_exact(spark):
    rows = cms_heavy_hitters(
        _docs(spark, TEXTS), depth=3, width=65536, k=50
    ).collect()
    assert rows and all(r["est"] == r["n_exact"] for r in rows)


def test_cms_topk_boundary_is_total_order(spark):
    rows = cms_heavy_hitters(
        _docs(spark, TEXTS), depth=2, width=4, k=3
    ).collect()
    ref = _ref_cms(TEXTS, 2, 4, 3)
    assert sorted((r["term"], r["est"], r["n_exact"]) for r in rows) == sorted(ref)


def _ref_zipf(texts, top_r):
    tf = Counter(
        t for x in texts for t in x.strip().lower().split() if t
    )
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_r]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = float(len(top))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num, denx, deny = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    slope = num / denx
    return len(top), slope, (sy - slope * sx) / n, num * num / (denx * deny)


def test_zipf_matches_closed_form_reference(spark):
    row = zipf_fit(_docs(spark, TEXTS), top_r=10).collect()[0]
    n, slope, intercept, r2 = _ref_zipf(TEXTS, 10)
    assert row["n_ranks"] == n
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-5
    assert abs(row["r2"] - r2) < 1e-5


def test_zipf_perfect_power_law(spark):
    # counts 240/rank for ranks 1..6: y = ln240 - x, an exact line
    counts = [240 // r for r in (1, 2, 3, 4, 5, 6)]
    text = " ".join(
        " ".join(f"t{i}" for _ in range(c)) for i, c in enumerate(counts)
    )
    row = zipf_fit(_docs(spark, [text]), top_r=6).collect()[0]
    assert row["n_ranks"] == 6
    assert abs(row["slope"] + 1.0) < 1e-5
    assert row["r2"] > 0.999999
    assert abs(row["intercept"] - math.log(240.0)) < 1e-5


def test_zipf_degenerate_single_rank_is_null(spark):
    row = zipf_fit(_docs(spark, ["only only only"]), top_r=5).collect()[0]
    assert row["n_ranks"] == 1
    assert row["slope"] is None and row["r2"] is None


def test_cms_single_corpus_pass(spark):
    """The tf checkpoint pins ONE corpus tokenize pass: the sketch
    build and the probe both read the vocabulary-sized checkpoint, so
    the final plan contains no corpus scan at all."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = cms_heavy_hitters(docs, depth=3, width=16, k=5)
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in tree
    assert "Scan ExistingRDD" in tree  # the checkpointed tf relation


def test_score_normalize_matches_percent_rank_reference(spark):
    from ocr_spark.operators.textops import score_normalize

    rows = [
        # domain a: scores with a tie group
        (1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 40),
        # domain b: distinct scores
        (5, "b", 1), (6, "b", 2), (7, "b", 3),
        # domain c: single row -> pct 0 by convention
        (8, "c", 99),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    got = {
        r["doc_id"]: r["score_pct"]
        for r in score_normalize(df).collect()
    }
    exp = {
        1: 0.0, 2: 1 / 3, 3: 1 / 3, 4: 3 / 3,
        5: 0.0, 6: 1 / 2, 7: 2 / 2,
        8: 0.0,
    }
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-7, (k, got[k], v)


def test_score_normalize_no_corpus_window(spark):
    """The corpus must never enter a window: every
    windowspecdefinition belongs to the LEVEL table (no doc_id in any
    spec), and the level table reaches the corpus via broadcast."""
    import re

    from ocr_spark.operators.textops import score_normalize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = score_normalize(docs, score_col="n_chars", domain_col="source")
    tree = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", tree)
    assert specs, "level windows expected"
    assert all("doc_id" not in s for s in specs), specs
    assert "BroadcastHashJoin" in tree
