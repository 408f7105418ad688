"""Preference-data construction (dpo_pairs / rft_select), mixing
sheets (temperature_sample / doremi_weights), corpus filters
(code_quality / license_tag), anchor aggregation and T5 span
corruption — the r5 ninth-session additions."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from ocr_spark.operators import graph as G
from ocr_spark.operators import prefops as PF
from ocr_spark.operators import textops as X


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ---------------------------------------------------------------- dpo


def _resp_df(spark):
    rows = [
        # prompt 0: clear spread, score tie at the top (ids 1, 2)
        (0, 1, "best a", 90),
        (0, 2, "best b", 90),
        (0, 3, "mid", 50),
        (0, 4, "worst", 10),
        # prompt 1: spread below the gap
        (1, 5, "a", 55),
        (1, 6, "b", 50),
        # prompt 2: single response (gap 0)
        (2, 7, "only", 80),
        # prompt 3: tie at the bottom (ids 9, 10)
        (3, 8, "top", 70),
        (3, 9, "low a", 20),
        (3, 10, "low b", 20),
    ]
    return spark.createDataFrame(
        rows, "prompt_id long, resp_id long, text string, score long"
    )


def test_dpo_pairs_argmax_argmin_and_gap(spark):
    out = {
        r["prompt_id"]: r
        for r in PF.dpo_pairs(_resp_df(spark), min_gap=10).collect()
    }
    # prompt 0: chosen = id 1 (score tie -> smaller id), rejected = 4
    assert out[0]["chosen_id"] == 1 and out[0]["rejected_id"] == 4
    assert out[0]["gap"] == 80
    assert out[0]["chosen_text"] == "best a"
    # prompt 3: rejected = id 9 (bottom tie -> smaller id)
    assert out[3]["chosen_id"] == 8 and out[3]["rejected_id"] == 9
    # prompts 1 (gap 5) and 2 (gap 0) are dropped
    assert set(out) == {0, 3}


def test_dpo_pairs_single_agg_no_join(spark):
    plan = _formatted(PF.dpo_pairs(_resp_df(spark), min_gap=10))
    tree = plan.split("\n\n(1)")[0]
    assert "Join" not in plan
    assert tree.count("Exchange") == 1
    # map-side combine: a partial aggregate runs before the shuffle
    assert "partial_max" in plan


def test_rft_select_dedup_threshold_topk(spark):
    rows = [
        # prompt 0: 'dup' appears 3x — best score copy (id 3) survives
        (0, 1, "dup", 60),
        (0, 2, "dup", 70),
        (0, 3, "dup", 90),
        (0, 4, "other", 80),
        (0, 5, "third", 75),
        (0, 6, "below", 40),  # under tau
        # prompt 1: everything under tau
        (1, 7, "x", 10),
        (1, 8, "y", 20),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, resp_id long, text string, score long"
    )
    out = PF.rft_select(df, tau=50, k=2).collect()
    got = {(r["prompt_id"], r["resp_id"], r["score"], r["rk"]) for r in out}
    # top-2 after dedup: id 3 (90), id 4 (80); 'third' (75) is rank 3
    assert got == {(0, 3, 90, 1), (0, 4, 80, 2)}


def test_rft_select_dup_tie_keeps_smaller_id(spark):
    rows = [(0, 1, "dup", 80), (0, 2, "dup", 80), (0, 3, "z", 60)]
    df = spark.createDataFrame(
        rows, "prompt_id long, resp_id long, text string, score long"
    )
    out = {r["resp_id"]: r["rk"] for r in PF.rft_select(df, 50, 2).collect()}
    assert out == {1: 1, 3: 2}


# ----------------------------------------------- temperature_sample


def _sel16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def test_temperature_sample_exact_vs_python(spark):
    # group sizes straddle perfect squares (isqrt edges 15/16/17)
    sizes = {"a": 15, "b": 16, "c": 17, "d": 3}
    rows, key = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((key, g))
            key += 1
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    budget = 20
    w = {g: math.isqrt(n) for g, n in sizes.items()}
    wt = sum(w.values())
    target = {
        g: min(sizes[g], budget * w[g] // wt) for g in sizes
    }
    thr = {g: target[g] * 65536 // sizes[g] for g in sizes}
    expected = {
        (k, g)
        for (k, g) in rows
        if _sel16(f"{k}#ts") < thr[g]
    }
    out = X.temperature_sample(
        df, budget=budget, domain_col="grp", key_col="doc_id"
    ).collect()
    assert {(r["doc_id"], r["grp"]) for r in out} == expected
    for r in out:
        assert r["n_docs"] == sizes[r["grp"]]
        assert r["target"] == target[r["grp"]]


def test_temperature_sample_full_target_keeps_all(spark):
    # budget >> corpus: every target caps at n_g -> threshold 65536
    df = spark.createDataFrame(
        [(i, "only") for i in range(10)], "doc_id long, grp string"
    )
    out = X.temperature_sample(
        df, budget=10000, domain_col="grp", key_col="doc_id"
    )
    assert out.count() == 10


# --------------------------------------------------- doremi_weights


def test_doremi_weights_vs_python(spark):
    rows = [
        (1, "a", "xxxx"),       # 4 chars
        (2, "a", "xxxxxxxx"),   # 8
        (3, "b", "xx"),         # 2
        (4, "b", None),         # NULL -> 0 chars
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in X.doremi_weights(df, "source").collect()}
    avg_all = 14.0 / 4.0
    for dom, (s, n) in {"a": (12, 2), "b": (2, 2)}.items():
        avg_d = s / n
        rel = avg_d / avg_all - 1.0
        assert out[dom]["n_docs"] == n
        assert out[dom]["avg_chars"] == np.float32(avg_d)
        assert out[dom]["rel"] == np.float32(rel)
        assert out[dom]["weight"] == np.float32(math.exp(rel))


# ----------------------------------------------------- code_quality


def test_code_quality_flags(spark):
    rows = [
        (1, "a" * 50),                      # clean single line
        (2, "b" * 1200),                    # max-line fail (alpha ok)
        (3, "0" * 100),                     # alpha fail
        (4, "ab\ncd\nef"),                  # 3 lines, avg 2
        (5, ""),                            # empty: passes vacuously
        (6, "x" * 300 + "\n" + "yy"),       # avg-line fail only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in X.code_quality(df).collect()}
    assert out[1]["passed"] == 1 and out[1]["max_line"] == 50
    assert out[2]["maxline_ok"] == 0 and out[2]["alpha_ok"] == 1
    assert out[2]["avgline_ok"] == 0  # 1200 avg also breaches 100
    assert out[3]["alpha_ok"] == 0 and out[3]["maxline_ok"] == 1
    assert out[4]["n_lines"] == 3 and out[4]["max_line"] == 2
    assert out[4]["avg_line"] == np.float32(2.0)
    assert out[4]["passed"] == 1
    assert out[5]["passed"] == 1 and out[5]["alpha_frac"] is None
    assert out[6]["avgline_ok"] == 0 and out[6]["maxline_ok"] == 1
    assert out[6]["alpha_ok"] == 1 and out[6]["passed"] == 0


# ------------------------------------------------------ license_tag


def test_license_tag_markers_and_precedence(spark):
    rows = [
        (1, "released under the Apache License 2.0"),
        (2, "see the mIt LiCeNsE for details"),
        (3, "MIT License. All Rights Reserved."),  # table order wins
        (4, "All rights reserved by the author"),
        (5, "no legal text at all"),
        (6, None),
        (7, "GNU General Public License v3"),
        (8, "Creative Commons Attribution"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["license"], r["permissive"]) for r in X.license_tag(df).collect()}
    assert out[1] == ("apache-2.0", 1)
    assert out[2] == ("mit", 1)
    assert out[3] == ("mit", 1)
    assert out[4] == ("proprietary", 0)
    assert out[5] == ("unknown", 0)
    assert out[6] == ("unknown", 0)
    assert out[7] == ("gpl-3.0", 0)
    assert out[8] == ("cc-by", 1)


# ------------------------------------------------------ anchor_topk


def test_anchor_topk_counts_and_ties(spark):
    rows = (
        [(i, 1, "a") for i in range(3)]
        + [(i, 1, "b") for i in range(3)]
        + [(9, 1, "c")]
        + [(i, 2, "z") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "src long, dst long, anchor string")
    out = {
        (r["dst"], r["rk"]): (r["anchor"], r["cnt"])
        for r in G.anchor_topk(df, k=2).collect()
    }
    # dst 1: a and b tie at 3 -> lexicographic; c (1) trimmed by k=2
    assert out[(1, 1)] == ("a", 3)
    assert out[(1, 2)] == ("b", 3)
    assert out[(2, 1)] == ("z", 5)
    assert len(out) == 3


def test_anchor_topk_window_group_limit_plan(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "src long, dst long, anchor string"
    )
    plan = _formatted(G.anchor_topk(df, k=3))
    assert "WindowGroupLimit" in plan


# -------------------------------------------------- span_corruption


def _span_ref(doc_id: int, n: int, density: int = 15, span: int = 3):
    groups = (n + span - 1) // span
    masked = spans = prev = 0
    for g in range(groups):
        m = 1 if _sel16(f"{doc_id}#sc{g}") % 100 < density else 0
        size = span if g < groups - 1 else n - span * g
        masked += m * size
        if m == 1 and prev == 0:
            spans += 1
        prev = m
    return masked, spans


def test_span_corruption_vs_python(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 40)))
        for i in range(200)
    ]
    rows.append((999, ""))  # zero-token doc: dropped
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in X.span_corruption(df).collect()}
    assert 999 not in out and len(out) == 200
    for i in range(200):
        n = 1 + (i * 7) % 40
        masked, spans = _span_ref(i, n)
        r = out[i]
        assert r["n_tokens"] == n
        assert r["n_masked"] == masked, i
        assert r["n_spans"] == spans, i
        assert r["enc_len"] == n - masked + spans
        assert r["tgt_len"] == masked + spans


def test_span_corruption_high_density_merges_spans(spark):
    # at 60% density adjacent masked groups are common: verify the
    # maximal-run merge against the reference and that merging happens
    rows = [
        (i, " ".join(f"w{j}" for j in range(30))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in X.span_corruption(df, density_pct=60).collect()}
    merged_somewhere = False
    for i in range(40):
        masked, spans = _span_ref(i, 30, density=60)
        assert (out[i]["n_masked"], out[i]["n_spans"]) == (masked, spans)
        n_masked_groups = sum(
            1
            for g in range(10)
            if _sel16(f"{i}#sc{g}") % 100 < 60
        )
        if spans < n_masked_groups:
            merged_somewhere = True
    assert merged_somewhere


# ------------------------------------------- extractive_coverage


def test_extractive_coverage_bounds(spark):
    rows = [
        (1, "the cat sat on the mat", "the cat sat"),   # full copy
        (2, "alpha beta gamma", "delta epsilon zeta"),  # novel
        (3, "a b c d", "a b zz"),                       # partial
        (4, "ctx here", ""),                            # dropped
        (5, "one two", "one"),                          # 1-token tgt
    ]
    df = spark.createDataFrame(rows, "pair_id long, context string, target string")
    out = {r["pair_id"]: r for r in X.extractive_coverage(df).collect()}
    assert 4 not in out
    assert out[1]["uni_cov"] == np.float32(1.0)
    assert out[1]["bi_cov"] == np.float32(1.0)
    assert out[2]["uni_cov"] == np.float32(0.0)
    assert out[2]["bi_cov"] == np.float32(0.0)
    # partial: 2 of 3 distinct unigrams hit; 1 of 2 bigrams hit
    assert out[3]["uni_cov"] == np.float32(2.0 / 3.0)
    assert out[3]["bi_cov"] == np.float32(0.5)
    # single-token target: no bigrams -> NULL bi_cov
    assert out[5]["uni_cov"] == np.float32(1.0)
    assert out[5]["bi_cov"] is None


# ------------------------------------------------------ edit_dedup


def test_edit_dedup_families_and_distance(spark):
    from ocr_spark.operators import dedup as DD

    prefix = "p1 p2 p3 p4 p5 p6 p7 p8"
    rows = [
        (1, prefix + " tail one"),
        (2, prefix + " tail one x"),       # dist 2 from doc 1
        (3, prefix + " " + "z" * 40),      # same family, far
        (10, "other prefix entirely differs from everything here a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r["dist"]
        for r in DD.edit_dedup(df, k=8, max_dist=8).collect()
    }
    assert out == {(1, 2): 2}


def test_edit_dedup_prunes_template_farms(spark):
    from ocr_spark.operators import dedup as DD

    prefix = "q1 q2 q3 q4 q5 q6 q7 q8"
    rows = [(i, f"{prefix} v{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # family of 10 > max_fam 4: pruned, zero pairs despite tiny dists
    assert DD.edit_dedup(df, k=8, max_dist=8, max_fam=4).count() == 0
    assert DD.edit_dedup(df, k=8, max_dist=8, max_fam=16).count() > 0


# ---------------------------------------------- instruction_filter


def test_instruction_filter_flags(spark):
    rows = [
        (1, "write a short poem", "Here is a poem."),
        (2, "hi", "Fine answer."),                       # inst short
        (3, "explain the rules", "As an AI language model, I cannot assist with that."),
        (4, "explain the rules", "It just stops and"),   # truncated
        (5, "echo me", "echo me"),                       # echo+incomplete
        (6, "tell me more", "Done!"),
        (7, "quote end", 'He said "stop."'),             # ends ." -> complete
    ]
    df = spark.createDataFrame(rows, "doc_id long, instruction string, response string")
    out = {r["doc_id"]: r for r in PF.instruction_filter(df).collect()}
    assert out[1]["kept"] == 1
    assert out[2]["len_ok"] == 0 and out[2]["kept"] == 0
    assert out[3]["not_refusal"] == 0
    assert out[4]["complete"] == 0
    assert out[5]["distinct_resp"] == 0 and out[5]["complete"] == 0
    assert out[6]["kept"] == 1
    assert out[7]["complete"] == 1


# ------------------------------------------------ shard_checksums


def test_shard_checksums_order_independent_and_sensitive(spark):
    rows = [(i, f"doc text {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        r["shard"]: (r["n_docs"], r["n_chars"], r["checksum"])
        for r in X.shard_checksums(df, shards=8).collect()
    }
    assert sum(v[0] for v in base.values()) == 200
    # order/partitioning independence
    shuffled = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, text string"
    ).repartition(7)
    again = {
        r["shard"]: (r["n_docs"], r["n_chars"], r["checksum"])
        for r in X.shard_checksums(shuffled, shards=8).collect()
    }
    assert base == again
    # one changed row flips exactly its shard's checksum
    mutated = [(i, f"doc text {i}" if i != 57 else "CHANGED") for i in range(200)]
    mdf = spark.createDataFrame(mutated, "doc_id long, text string")
    mut = {
        r["shard"]: (r["n_docs"], r["n_chars"], r["checksum"])
        for r in X.shard_checksums(mdf, shards=8).collect()
    }
    diff = [s for s in base if base[s] != mut.get(s)]
    assert len(diff) == 1
    assert base[diff[0]][0] == mut[diff[0]][0]  # same row count


# -------------------------------------------------------- win_matrix


def test_win_matrix_counts(spark):
    rows = [
        # prompt 0: ma best 80 (two responses collapse), mb best 70
        (0, 1, "ma", 60),
        (0, 2, "ma", 80),
        (0, 3, "mb", 70),
        # prompt 1: tie at 50
        (1, 4, "ma", 50),
        (1, 5, "mb", 50),
        # prompt 2: mb wins; mc appears only here
        (2, 6, "ma", 10),
        (2, 7, "mb", 90),
        (2, 8, "mc", 20),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, resp_id long, model string, score long"
    )
    out = {
        (r["model_a"], r["model_b"]): r
        for r in PF.win_matrix(df).collect()
    }
    ab = out[("ma", "mb")]
    assert (ab["wins_a"], ab["wins_b"], ab["ties"], ab["n_prompts"]) == (1, 1, 1, 3)
    ac = out[("ma", "mc")]
    assert (ac["wins_a"], ac["wins_b"], ac["n_prompts"]) == (0, 1, 1)
    bc = out[("mb", "mc")]
    assert (bc["wins_a"], bc["n_prompts"]) == (1, 1)
    for r in out.values():
        assert r["wins_a"] + r["wins_b"] + r["ties"] == r["n_prompts"]


# -------------------------------------------------- length_quantiles


def test_length_quantiles_disc_semantics(spark):
    rows = [("a", " ".join(["w"] * n)) for n in [1, 2, 3, 4]] + [
        ("b", " ".join(["w"] * n)) for n in [10] * 9 + [100]
    ] + [("b", None)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in X.length_quantiles(df).collect()}
    # domain a (n=4): ranks ceil(q*4/100) = 1,2,3,4 -> 1,2,3,4
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p75"], out["a"]["p95"]) == (1, 2, 3, 4)
    # domain b (10 rows, NULL excluded): p95 rank ceil(9.5)=10 -> 100
    assert out["b"]["n_docs"] == 10
    assert (out["b"]["p25"], out["b"]["p50"], out["b"]["p75"]) == (10, 10, 10)
    assert out["b"]["p95"] == 100


# ------------------------------------------------------ corpus_card


def test_corpus_card_sheet(spark):
    rows = [
        (1, "a", "the cat is on the mat under the MIT License"),
        (2, "a", "zxq1"),                        # unknown lang
        (3, "a", "the dog is in the house"),
        (4, "b", "All Rights Reserved zzz qqq"),  # non-permissive
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in X.corpus_card(df).collect()}
    a = out["a"]
    assert a["n_docs"] == 3 and a["n_permissive"] == 1 and a["n_en"] == 2
    assert a["pct_en"] == np.float32(2.0 / 3.0)
    assert a["pct_permissive"] == np.float32(1.0 / 3.0)
    b = out["b"]
    assert b["n_permissive"] == 0 and b["n_en"] == 0
    assert b["n_tokens"] == 5


def test_corpus_card_single_agg_no_join(spark):
    df = spark.createDataFrame(
        [(1, "a", "x y z")], "doc_id long, source string, text string"
    )
    plan = _formatted(X.corpus_card(df))
    assert "Join" not in plan


def test_instruction_filter_null_and_newline_policy(spark):
    rows = [
        (1, None, None),              # NULL inst: 0-token, flags 0/1
        (2, "tell me a story", "The end.\n"),  # trailing newline
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, instruction string, response string"
    )
    out = {r["doc_id"]: r for r in PF.instruction_filter(df).collect()}
    assert out[1]["inst_tokens"] == 0
    assert out[1]["len_ok"] == 0 and out[1]["kept"] == 0
    # \z anchor: '.\n' is NOT sentence-final (Java $ would say it is,
    # RE2 $ would not — \z agrees on both engines)
    assert out[2]["complete"] == 0


def test_code_quality_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = X.code_quality(df).collect()[0]
    assert r["n_lines"] == 1 and r["passed"] == 1
    assert r["alpha_frac"] is None  # 0-char doc, ratio undefined


# ---------------------------------------------------------- elo_fit


def _elo_ref(matrix, iters=3):
    """Python MM reference: matrix rows (a, b, wins_a, wins_b, ties,
    n); anchor = max-W model (ties -> smallest name)."""
    pairs = []
    for a, b, wa, wb, t, n in matrix:
        pairs.append((a, b, wa + t / 2, n))
        pairs.append((b, a, wb + t / 2, n))
    models = sorted({m for m, *_ in pairs})
    W = {m: sum(w for mm, _, w, _ in pairs if mm == m) for m in models}
    anchor = min(models, key=lambda m: (-W[m], m))
    g = {m: np.float32(1.0) for m in models}
    for _ in range(iters):
        den = {
            m: sum(
                n / (float(g[m]) + float(g[o]))
                for mm, o, _, n in pairs
                if mm == m
            )
            for m in models
        }
        raw = {m: W[m] / den[m] for m in models}
        g = {m: np.float32(raw[m] / raw[anchor]) for m in models}
    return g, anchor


def test_elo_fit_vs_python(spark):
    matrix = [
        ("ma", "mb", 6, 3, 1, 10),
        ("ma", "mc", 2, 7, 1, 10),
        ("mb", "mc", 5, 5, 0, 10),
    ]
    df = spark.createDataFrame(
        matrix,
        "model_a string, model_b string, wins_a long, wins_b long,"
        " ties long, n_prompts long",
    )
    ref, anchor = _elo_ref(matrix)
    out = {r["model"]: r for r in PF.elo_fit(df, iters=3).collect()}
    assert set(out) == set(ref)
    for m in ref:
        assert out[m]["rating"] == ref[m], m
        assert out[m]["elo"] == np.float32(
            400.0 * math.log10(float(ref[m]))
        )
    # the anchor holds rating 1 by construction
    assert out[anchor]["rating"] == np.float32(1.0)
    # mc beat ma 7-2 and split with mb: it must rate highest
    assert max(out, key=lambda m: out[m]["rating"]) == "mc"


def test_elo_fit_zero_win_model(spark):
    matrix = [("ma", "mb", 5, 0, 0, 5)]
    df = spark.createDataFrame(
        matrix,
        "model_a string, model_b string, wins_a long, wins_b long,"
        " ties long, n_prompts long",
    )
    out = {r["model"]: r["rating"] for r in PF.elo_fit(df, 3).collect()}
    assert out["ma"] == np.float32(1.0)
    assert out["mb"] == np.float32(0.0)  # BT MLE boundary


def test_temperature_sample_broadcast_no_smj(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "doc_id long, grp string"
    )
    plan = _formatted(
        X.temperature_sample(df, budget=10, domain_col="grp")
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_edit_dedup_randomized_vs_python(spark):
    import random

    from ocr_spark.operators import dedup as DD

    for seed in range(6):
        rng = random.Random(f"edit#{seed}")
        vocab = [f"w{v}" for v in range(12)]
        rows = []
        for i in range(40):
            prefix = [vocab[rng.randrange(3)] for _ in range(8)]
            tail = [vocab[rng.randrange(12)] for _ in range(rng.randrange(0, 6))]
            rows.append((i, " ".join(prefix + tail)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["dist"]
            for r in DD.edit_dedup(df, k=8, max_dist=8, max_fam=64).collect()
        }
        # python reference: same blocking (first-8 lowercased tokens,
        # 2 <= fam <= 64), full Levenshtein, <= 8
        fams: dict[str, list[int]] = {}
        texts = dict(rows)
        for i, t in rows:
            toks = t.lower().split()
            pre = " ".join(toks[:8])
            if pre:
                fams.setdefault(pre, []).append(i)
        exp = {}
        for pre, members in fams.items():
            if not (2 <= len(members) <= 64):
                continue
            ms = sorted(members)
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    d = _lev(texts[ms[x]], texts[ms[y]])
                    if d <= 8:
                        exp[(ms[x], ms[y])] = d
        assert got == exp, seed


def test_manifest_diff_flags_only_changed_shards(spark):
    rows = [(i, f"doc {i}") for i in range(400)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    # mutate exactly one doc, drop exactly one other
    rows_b = [
        (i, "MUTATED" if i == 111 else f"doc {i}")
        for i in range(400)
        if i != 222
    ]
    b = spark.createDataFrame(rows_b, "doc_id long, text string")
    out = {r["shard"]: r for r in X.manifest_diff(a, b, shards=16).collect()}
    changed = {s for s, r in out.items() if r["changed"] == 1}
    sh = lambda i: _sel16(str(i)) % 16  # noqa: E731
    assert changed == {sh(111), sh(222)}
    # the dropped doc's shard loses exactly one row
    assert out[sh(222)]["n_docs_a"] - out[sh(222)]["n_docs_b"] == 1
    # identical snapshots: zero changed
    clean = X.manifest_diff(a, a, shards=16)
    assert clean.filter(F.col("changed") == 1).count() == 0


def test_manifest_diff_emptied_shard(spark):
    rows = [(i, f"doc {i}") for i in range(300)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    # snapshot b drops EVERY doc of one shard: the full-outer branch
    sh = lambda i: _sel16(str(i)) % 8  # noqa: E731
    victim = sh(0)
    rows_b = [(i, t) for i, t in rows if sh(i) != victim]
    b = spark.createDataFrame(rows_b, "doc_id long, text string")
    out = {r["shard"]: r for r in X.manifest_diff(a, b, shards=8).collect()}
    v = out[victim]
    assert v["changed"] == 1
    assert v["n_docs_b"] == 0 and v["checksum_b"] == -1
    assert v["n_docs_a"] > 0
    assert sum(r["changed"] for r in out.values()) == 1
    # and the mirror: a shard newborn in b
    out2 = {r["shard"]: r for r in X.manifest_diff(b, a, shards=8).collect()}
    assert out2[victim]["n_docs_a"] == 0
    assert out2[victim]["checksum_a"] == -1
    assert out2[victim]["changed"] == 1


def test_elo_fit_zero_win_elo_is_null(spark):
    df = spark.createDataFrame(
        [("ma", "mb", 5, 0, 0, 5)],
        "model_a string, model_b string, wins_a long, wins_b long,"
        " ties long, n_prompts long",
    )
    out = {r["model"]: r for r in PF.elo_fit(df, 3).collect()}
    assert out["mb"]["rating"] == np.float32(0.0)
    assert out["mb"]["elo"] is None  # boundary: NULL, never -inf
    assert out["ma"]["elo"] == np.float32(0.0)  # log10(1) = 0
