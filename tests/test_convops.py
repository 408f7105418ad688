"""Conversation-structure QA + the batching/diversity sheets added in
the r5 eighth session: conv_stats/conv_filter, length buckets,
tokenizer fit, distinct-n diversity, cluster stats, template families."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators import convops as CV
from ocr_spark.operators import dedup as D
from ocr_spark.operators import textops as X


def _transcript_rows():
    rows = []
    for cid in range(6):
        for t in range(4):
            role = "user" if t % 2 == 0 else "assistant"
            if cid == 2 and t == 1:
                role = "user"  # alternation violation (two breaks)
            if cid == 3 and t == 0:
                role = "assistant"  # wrong opener + one violation
            text = (
                ""
                if (cid == 4 and t == 2)
                else f"turn {cid} {t} words here"
            )
            rows.append((cid, t, role, text))
    # conv 5: a NULL text turn (empty policy) on top of clean roles
    rows = [
        (c, t, r, None) if (c == 5 and t == 3) else (c, t, r, x)
        for (c, t, r, x) in rows
    ]
    return rows


def _tdf(spark):
    return spark.createDataFrame(
        _transcript_rows(),
        "conv_id long, turn_idx int, role string, text string",
    )


def test_conv_stats_counters(spark):
    got = {
        r["conv_id"]: r for r in CV.conv_stats(_tdf(spark)).collect()
    }
    assert got[0]["n_violations"] == 0 and got[0]["n_empty"] == 0
    assert got[0]["first_role"] == "user"
    assert got[0]["n_user"] == 2 and got[0]["n_assistant"] == 2
    # the single role flip breaks alternation on BOTH sides
    assert got[2]["n_violations"] == 2 and got[2]["n_user"] == 3
    assert got[3]["first_role"] == "assistant"
    assert got[3]["n_violations"] == 1
    assert got[4]["n_empty"] == 1
    # NULL text counts as empty and adds 0 chars
    assert got[5]["n_empty"] == 1
    assert got[5]["total_chars"] == sum(
        len(f"turn 5 {t} words here") for t in range(3)
    )


def test_conv_filter_keeps_only_structurally_clean(spark):
    kept = CV.conv_filter(_tdf(spark), min_turns=2, max_turns=10)
    by_conv = {
        r["conv_id"]
        for r in kept.select("conv_id").distinct().collect()
    }
    assert by_conv == {0, 1}  # 2/3 violate roles, 4/5 have empties
    assert kept.count() == 8  # original turn rows survive intact
    assert kept.filter(F.col("n_turns") != 4).count() == 0


def test_conv_filter_turn_bounds_and_opener_switch(spark):
    df = _tdf(spark)
    assert (
        CV.conv_filter(df, min_turns=5, max_turns=10).count() == 0
    )
    # disabling the opener requirement admits conv 3? no — it still
    # has an alternation violation; disabling both admits it
    got = CV.conv_filter(
        df, require_first=None, require_alternating=False
    )
    convs = {r["conv_id"] for r in got.select("conv_id").collect()}
    assert convs == {0, 1, 2, 3}


def test_length_bucket_boundaries_exact(spark):
    # exact powers of two are the dangerous boundary for a log2-based
    # bucket; the bit-length form must be exact
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(
            [0, 1, 2, 3, 4, 7, 8, 1023, 1024]
        )],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in X.with_length_bucket(docs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 10,
                   8: 11}


def test_length_histogram_ranges_partition_the_line(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(64)],
        "doc_id long, text string",
    )
    rows = sorted(
        X.length_histogram(docs).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    for r in rows:
        assert r["bucket_lo"] == 2 ** (r["bucket"] - 1)
        assert r["bucket_hi"] == 2 ** r["bucket"] - 1
        assert r["bucket_lo"] <= r["min_tokens"]
        assert r["max_tokens"] <= r["bucket_hi"]
    assert sum(r["n_docs"] for r in rows) == 64
    assert sum(r["total_tokens"] for r in rows) == 64 * 65 // 2


def test_tokenizer_fit_ratios(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "hello world"),  # 2 words, 2 bpe, 11 chars
            (2, "a", "it's 42%"),  # 2 words, 6 bpe runs, 8 chars
            (3, "b", ""),  # zero-token domain -> NULL ratios
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in X.tokenizer_fit(docs).collect()}
    a = got["a"]
    assert a["ws_tokens"] == 4 and a["total_chars"] == 19
    # it ' s 42 % -> 5 runs + hello world 2 runs
    assert a["bpe_tokens"] == 7
    assert abs(a["fertility"] - 7.0 / 4.0) < 1e-6
    assert abs(a["chars_per_word"] - 19.0 / 4.0) < 1e-6
    b = got["b"]
    assert b["ws_tokens"] == 0 and b["fertility"] is None
    assert b["chars_per_word"] is None


def test_distinct_ngrams_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "the cat sat"),
            (2, "a", "the cat ran"),
            (3, "b", "solo"),  # no bigrams -> NULL bigram columns
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in X.distinct_ngrams(docs).collect()}
    a = got["a"]
    assert a["total_unigrams"] == 6 and a["distinct_unigrams"] == 4
    assert a["total_bigrams"] == 4  # the-cat x2, cat-sat, cat-ran
    assert a["distinct_bigrams"] == 3
    assert abs(a["ttr"] - 4.0 / 6.0) < 1e-6
    assert abs(a["bigram_ttr"] - 3.0 / 4.0) < 1e-6
    b = got["b"]
    assert b["total_unigrams"] == 1 and b["total_bigrams"] is None
    assert b["bigram_ttr"] is None


def test_cluster_stats_against_assignment(spark):
    import random

    from ocr_spark.operators import clustering as CL

    rng = random.Random(11)
    emb = spark.createDataFrame(
        [
            (i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    asg = CL.kmeans_assign(emb, k=3, iters=1, vec_dims=8).collect()
    got = {
        r["cid"]: r
        for r in CL.cluster_stats(
            emb, k=3, iters=1, vec_dims=8
        ).collect()
    }
    by_cid: dict = {}
    for r in asg:
        by_cid.setdefault(r["cid"], []).append(r)
    assert set(got) == set(by_cid)
    for cid, rows in by_cid.items():
        g = got[cid]
        assert g["n_members"] == len(rows)
        assert g["exemplar"] == min(r["vec_id"] for r in rows)
        assert g["min_cos"] == min(r["cos"] for r in rows)
        assert g["max_cos"] == max(r["cos"] for r in rows)
        import numpy as np

        assert g["avg_cos"] == np.float32(
            sum(r["cos"] for r in rows) / len(rows)
        )


def test_template_families_prefix_grouping(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha beta gamma delta epsilon zeta eta theta one"),
            (2, "alpha beta gamma delta epsilon zeta eta theta two x"),
            (3, "alpha beta gamma delta DIFFERENT zeta eta theta two"),
            (4, "unrelated words entirely"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = D.template_families(docs, k=8, min_df=2).collect()
    assert {r["doc_id"] for r in got} == {1, 2}  # case-folded prefix
    fams = {r["family"] for r in got}
    assert len(fams) == 1
    assert all(r["fam_size"] == 2 for r in got)
    # short docs below min_df never return; empty docs never fingerprint
    got1 = D.template_families(docs, k=2, min_df=3).collect()
    assert {r["doc_id"] for r in got1} == {1, 2, 3}


def test_conv_filter_composes_with_sft_examples(spark):
    # the sft_curation composition contract: within kept convs,
    # assistant turns sit at odd turn_idx (user-first alternation)
    kept = CV.conv_filter(_tdf(spark), min_turns=2, max_turns=10)
    bad = kept.filter(
        (
            (F.col("turn_idx") % 2 == 0)
            & (F.col("role") != "user")
        )
        | ((F.col("turn_idx") % 2 == 1) & (F.col("role") != "assistant"))
    )
    assert bad.count() == 0
    ex = X.sft_examples(kept.drop("n_turns"), context_turns=3)
    assert ex.filter(F.col("turn_idx") % 2 == 0).count() == 0


def test_conv_near_dup_pairs(spark):
    rows = []
    for t in range(8):
        rows.append((1, t, "user" if t % 2 == 0 else "assistant", f"turn text {t}"))
        # conv 2: near-dup of conv 1 (one turn mangled)
        rows.append((2, t, "user" if t % 2 == 0 else "assistant",
                     f"turn text {t}" if t != 0 else "totally different opener"))
        # conv 3: same SET of turns as conv 1 but reversed ORDER
        rows.append((3, t, "user", f"turn text {7 - t}"))
        # conv 4: unrelated
        rows.append((4, t, "user", f"other conversation {t} entirely"))
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in CV.conv_near_dup(df).collect()}
    assert (1, 2) in out and 0.5 < out[(1, 2)] < 1.0
    # order-sensitivity: reversed turn order shares NO 3-gram shingle
    assert (1, 3) not in out
    assert not any(4 in pair for pair in out)


def test_conv_near_dup_ws_case_canonical(spark):
    rows = []
    for t in range(6):
        rows.append((1, t, "user", f"Turn  Text {t}"))
        rows.append((2, t, "user", f"turn text {t}"))  # canonical-equal
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in CV.conv_near_dup(df).collect()}
    assert out.get((1, 2)) == 1.0
