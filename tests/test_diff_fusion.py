"""corpus_diff + rrf_fuse: status semantics and fusion arithmetic."""

from __future__ import annotations

import pytest

from ocr_spark.operators.relational import corpus_diff
from ocr_spark.operators.search import rrf_fuse


def test_corpus_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (5, "e"), (4, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        5: "added",
        # NULL text fingerprints as '' (documented policy): NULL -> ''
        # reads unchanged
        4: "unchanged",
    }


def test_corpus_diff_identical_snapshots_all_unchanged(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], ["doc_id", "text"]
    )
    rows = corpus_diff(df, df).collect()
    assert len(rows) == 20
    assert all(r["status"] == "unchanged" for r in rows)


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, ["doc_id", "rank"])


def test_rrf_matches_hand_computation(spark):
    a = _ranking(spark, [(10, 1), (20, 2), (30, 3)])
    b = _ranking(spark, [(20, 1), (40, 2)])
    got = {
        r["doc_id"]: (r["rrf"], r["n_lists"])
        for r in rrf_fuse([a, b], k0=60, k=10).collect()
    }
    exp = {
        10: 1 / 61,
        20: 1 / 62 + 1 / 61,
        30: 1 / 63,
        40: 1 / 62,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert abs(got[d][0] - s) < 1e-7
    assert got[20][1] == 2 and got[10][1] == 1
    # the doc present in both lists must outrank every single-list doc
    assert max(got, key=lambda d: got[d][0]) == 20


def test_rrf_top_k_cut_and_tiebreak(spark):
    # identical ranks -> identical scores; the doc_id tie-break decides
    a = _ranking(spark, [(3, 1), (1, 2), (2, 2)])
    rows = rrf_fuse([a], k0=60, k=2).collect()
    assert [r["doc_id"] for r in rows] == [3, 1]


def test_rrf_empty_rankings_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([], k0=60, k=5)


def test_corpus_diff_randomized_equivalence(spark):
    """Seeded random snapshot pairs vs a dict-diff reference."""
    import random

    for seed in range(20):
        rng = random.Random(f"cd#{seed}")
        ids = range(rng.randint(1, 25))
        old = {i: rng.choice(["a", "b", None]) for i in ids if rng.random() < 0.8}
        new = {
            i: rng.choice(["a", "b", None])
            for i in range(rng.randint(1, 25))
            if rng.random() < 0.8
        }

        def fp(v):
            return v if v is not None else ""

        exp = {}
        for i in set(old) | set(new):
            if i not in old:
                exp[i] = "added"
            elif i not in new:
                exp[i] = "removed"
            elif fp(old[i]) != fp(new[i]):
                exp[i] = "changed"
            else:
                exp[i] = "unchanged"
        if not old or not new:
            continue  # createDataFrame needs rows; empty snapshots
        ddl = "doc_id long, text string"  # all-None columns can't infer
        o = spark.createDataFrame([(i, t) for i, t in old.items()], ddl)
        n = spark.createDataFrame([(i, t) for i, t in new.items()], ddl)
        got = {
            r["doc_id"]: r["status"]
            for r in corpus_diff(o, n).collect()
        }
        assert got == exp, seed


def test_bm25_multi_equals_independent_single_probes(spark):
    """bm25_topk_multi must be interchangeable with independent
    bm25_topk calls: same docs, same round-4 scores, same ranks."""
    from ocr_spark.operators.search import bm25_topk, bm25_topk_multi

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    probes = {
        "a": ["hash", "join", "merge"],
        "b": ["merge", "sort", "scan"],
    }
    multi = bm25_topk_multi(docs, probes, k=15)
    got = {
        (r["q_key"], r["doc_id"]): (r["bm25"], r["n_terms"], r["rank"])
        for r in multi.collect()
    }
    for q_key, terms in probes.items():
        single = bm25_topk(docs, terms, k=15).collect()
        for rank, r in enumerate(single, start=1):
            assert got[(q_key, r["doc_id"])] == (
                r["bm25"],
                r["n_terms"],
                rank,
            ), (q_key, r["doc_id"])
    assert len(got) == 30


def test_bm25_multi_topk_is_window_group_limit(spark):
    """The per-probe top-k must compile to WindowGroupLimit
    (Partial+Final map-side heads), never a monolithic per-probe
    sort (the weighted_sample lesson)."""
    from ocr_spark.operators.search import bm25_topk_multi

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = bm25_topk_multi(docs, {"a": ["hash"], "b": ["scan"]}, k=5)
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in tree
