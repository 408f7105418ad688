"""Tests for the mix/clean operator family: intra_doc_dedup,
token_budget_mix, quality_select, unicode_clean, ngram_topk."""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import intra_doc_dedup
from ocr_spark.operators.textops import (
    ngram_topk,
    quality_select,
    token_budget_mix,
    unicode_clean,
)


def test_intra_doc_dedup_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb"),   # two repeats, interleaved
            (2, "x\ny\nz"),          # no repeats -> unchanged
            (3, "q\nq\nq\nq"),       # one line flooded
            (4, "  a\na"),           # exact match only: '  a' != 'a'
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in intra_doc_dedup(df).collect()
    }
    assert out[1]["text_clean"] == "a\nb\nc"
    assert (out[1]["n_lines"], out[1]["n_dropped"]) == (5, 2)
    assert out[2]["text_clean"] == "x\ny\nz"
    assert out[2]["n_dropped"] == 0
    assert out[3]["text_clean"] == "q"
    assert out[3]["n_dropped"] == 3
    # no trimming: whitespace variants are distinct lines by design
    assert out[4]["text_clean"] == "  a\na"


def test_intra_doc_dedup_is_pure_map(spark):
    df = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
    tree = intra_doc_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in tree, "intra-doc dedup must not shuffle"


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def test_token_budget_mix_matches_greedy_reference(spark):
    # domain 'small' sits under budget (all kept); 'big' is clipped.
    rows = []
    for i in range(6):
        rows.append((i, "small", "tok " * 3))          # 3 tokens each
    for i in range(100, 140):
        rows.append((i, "big", "w " * (5 + i % 7)))    # 5..11 tokens
    df = spark.createDataFrame(
        [(i, d, t.strip()) for i, d, t in rows],
        "doc_id long, source string, text string",
    )
    out = token_budget_mix(df, budget_tokens=60).collect()
    got = {(r["doc_id"]): (r["n_tokens"], r["cum_tokens"]) for r in out}

    # python greedy reference over the same md5 order
    exp = {}
    for dom in ("small", "big"):
        docs = [(i, d, t) for i, d, t in rows if d == dom]
        docs.sort(key=lambda r: (_md5(r[0]), r[0]))
        cum = 0
        for i, _, t in docs:
            n = len(t.split())
            if cum < 60:
                cum += n
                exp[i] = (n, cum)
            else:
                break
    assert got == exp
    # the under-budget domain keeps every doc
    assert all(i in got for i in range(6))


def test_token_budget_mix_overshoots_by_at_most_one_doc(spark):
    df = spark.createDataFrame(
        [(i, "d", "t " * 10) for i in range(50)],
        "doc_id long, source string, text string",
    )
    out = token_budget_mix(df, budget_tokens=95).orderBy("cum_tokens")
    rows = out.collect()
    # last kept doc crosses the budget; everything before it is under
    assert rows[-1]["cum_tokens"] >= 95
    assert rows[-1]["cum_tokens"] - rows[-1]["n_tokens"] < 95
    assert rows[-2]["cum_tokens"] < 95


def test_quality_select_per_domain_fraction_and_boundary(spark):
    words = ["the", "fast", "table", "row", "scan", "merge", "is", "a"]
    rows = [
        (i, f"src{i % 3}", " ".join(words[: 2 + i % 7]) )
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    frac = 0.4
    out = quality_select(df, frac=frac).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    n_per_dom = {f"src{k}": 20 for k in range(3)}
    for dom, kept in by_dom.items():
        assert len(kept) == math.ceil(frac * n_per_dom[dom])
        # ranks are 1..k with deterministic boundary
        assert sorted(r["rk"] for r in kept) == list(
            range(1, len(kept) + 1)
        )
    # kept min quality >= dropped max quality within each domain
    # (ties broken toward the smaller doc_id, checked via rk order)
    full = quality_select(df, frac=1.0).collect()
    for dom in n_per_dom:
        scored = sorted(
            [r for r in full if r["source"] == dom],
            key=lambda r: (-r["quality"], r["doc_id"]),
        )
        kept_ids = {r["doc_id"] for r in by_dom[dom]}
        assert kept_ids == {r["doc_id"] for r in scored[: len(kept_ids)]}


def test_unicode_clean_canonicalizations(spark):
    cases = [
        # curly quotes + dashes -> ascii
        ("\u201chi\u201d \u2013 there \u2014 ok", '"hi" - there - ok'),
        # zero-width / BOM / soft hyphen strip
        ("\ufeffa\u200bb\u00adc\u200dd", "abcd"),
        # control chars stripped, \n survives; tabs -> spaces
        ("a\x07b\x00c\nnext", "abc\nnext"),
        ("a\tb", "a b"),
        ("\tx", "x"),
        # unicode spaces -> ascii space, runs collapse, edges trim
        ("x\u00a0\u2009y\u3000 z ", "x y z"),
        # ellipsis expands so sentence rules see punctuation
        ("wait\u2026", "wait..."),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text_clean"] for r in unicode_clean(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert out[i] == want, (i, out[i], want)


def test_unicode_clean_is_idempotent(spark):
    df = spark.createDataFrame(
        [
            (1, "\u201cm\u2026\u201d \u2014 x\u200b\u00a0 y\x07z"),
            (2, "already clean text."),
        ],
        "doc_id long, text string",
    )
    once = unicode_clean(df).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    twice = unicode_clean(once).select("doc_id", "text_clean")
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text_clean"] for r in twice.collect()}
    assert a == b


def test_ngram_topk_counts_and_tie_boundary(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b"),   # 'a b c' x2, 'b c a' x2, 'c a b' x2
            (2, "a b c"),             # 'a b c' -> 3 total
            (3, "z z"),               # too short for trigrams
        ],
        "doc_id long, text string",
    )
    out = ngram_topk(df, n=3, k=2).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in out] == [
        ("a b c", 3),
        ("b c a", 2),  # tie with 'c a b' broken by gram asc
    ]


def test_domain_upsample_epochs_and_fractional_selection(spark):
    import pytest

    from ocr_spark.operators.textops import domain_upsample

    rows = [(i, ["wiki", "cc", "other"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_upsample(df, {"wiki": 2.5, "cc": 0.25}).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])

    thr_half = int(0.5 * 65536)
    thr_quarter = int(0.25 * 65536)
    for i, dom in rows:
        sel = int(_md5(f"{i}#up")[:4], 16)
        if dom == "wiki":
            want = 2 + (1 if sel < thr_half else 0)
        elif dom == "cc":
            want = 1 if sel < thr_quarter else 0
        else:
            want = 1  # absent domain passes through once
        got = sorted(by_doc.get(i, []))
        assert got == list(range(want)), (i, dom, got, want)

    with pytest.raises(ValueError):
        domain_upsample(df, {"wiki": -1.0})


def test_corpus_stats_hand_checked(spark):
    from ocr_spark.operators.textops import corpus_stats

    df = spark.createDataFrame(
        [
            (1, "a", "the fast table"),          # 3 tokens
            (2, "a", "scan"),                    # 1 token
            (3, "b", "the the the the the"),     # 5 tokens, stopwordy
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in corpus_stats(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["total_tokens"]) == (2, 4)
    assert (a["min_tokens"], a["max_tokens"]) == (1, 3)
    assert a["avg_tokens"] == 2.0
    assert (b["n_docs"], b["total_tokens"]) == (1, 5)
    # quality is the with_quality blend; 'b' is all stopwords ->
    # 0.4*(5/50) + 0.3*(15/19 alpha) + 0.3*min(1, 5*5/5) = high
    assert b["n_high_quality"] == 1


def test_epoch_shards_composition_scatters_epochs(spark):
    """domain_upsample -> shard_assign keyed on doc_id:epoch — every
    occurrence gets a shard/pos, positions are contiguous per shard,
    and a document's epochs scatter across shards rather than
    clumping (the occurrence key hashes apart)."""
    from ocr_spark.driver_contract import q_epoch_shards

    out = q_epoch_shards(spark, "/root/testdata/sf0.001").collect()
    # positions contiguous 1..n per shard
    by_shard: dict[int, list[int]] = {}
    multi: dict[int, set[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
        multi.setdefault(r["doc_id"], set()).add(r["shard"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # docs with 3 epochs (src2 factor 3.0) use >1 shard almost surely;
    # assert the aggregate scatter rather than any single doc
    tri = [s for d, s in multi.items() if len(s) >= 2]
    assert tri, "no doc scattered across shards"


def test_weighted_sample_matches_reference_and_bias(spark):
    import math

    from ocr_spark.operators.textops import weighted_sample

    # two weight classes; heavy rows 10x the weight of light rows
    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, k=50, weight_col="w").collect()

    # python reference: same 48-bit md5 uniform, same race
    def es(i, w):
        u = (int(_md5(i)[:12], 16) + 1) / float(1 << 48)
        return math.log(u) / w

    ref = sorted(rows, key=lambda r: (-es(r[0], r[1]), r[0]))[:50]
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rk"])] == [
        i for i, _ in ref
    ]
    # heavy rows dominate the sample (p ~ 10:1 per race)
    heavy = sum(1 for r in out if r["w"] == 10.0)
    assert heavy > 35, heavy

    # zero/negative weights are excluded
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 1.0)], "doc_id long, w double"
    )
    kept = [r["doc_id"] for r in weighted_sample(df2, 3, "w").collect()]
    assert kept == [3]


def test_weighted_sample_plans_window_group_limit(spark):
    from ocr_spark.operators.textops import weighted_sample

    df = spark.createDataFrame(
        [(i, f"d{i % 4}", 1.0 + i % 3) for i in range(100)],
        "doc_id long, source string, w double",
    )
    out = weighted_sample(df, 5, "w", domain_col="source")
    tree = out._jdf.queryExecution().executedPlan().toString()
    # partial top-k per input partition BEFORE the shuffle
    assert "WindowGroupLimit" in tree


def test_doc_chunks_coverage_overlap_and_edges(spark):
    import pytest

    from ocr_spark.operators.textops import doc_chunks

    toks = [f"t{i}" for i in range(11)]
    df = spark.createDataFrame(
        [
            (1, " ".join(toks)),        # 11 tokens -> 3 chunks
            (2, "a b c"),               # under window -> 1 chunk
            (3, ""),                    # blank -> one empty chunk
        ],
        "doc_id long, text string",
    )
    out = doc_chunks(df, chunk_tokens=4, overlap=1)
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # starts 0,3,6,9 -> 4 chunks; last clips to 2 tokens
    assert [r["chunk_text"] for r in d1] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
        "t9 t10",
    ]
    assert [r["n_chunk_tokens"] for r in d1] == [4, 4, 4, 2]
    # every token somewhere; consecutive chunks share `overlap` tokens
    seen = set(" ".join(r["chunk_text"] for r in d1).split())
    assert seen == set(toks)
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c"
    d3 = [r for r in rows if r["doc_id"] == 3]
    assert len(d3) == 1 and d3[0]["chunk_text"] == ""

    # pure map: no shuffle
    tree = (
        doc_chunks(df, 4, 1)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in tree

    with pytest.raises(ValueError):
        doc_chunks(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        # negative overlap would stride past chunk ends: token gaps
        doc_chunks(df, chunk_tokens=4, overlap=-1)


def test_weighted_sample_global_plans_take_ordered(spark):
    """The global variant must NOT plan a single-partition window sort
    (WindowGroupLimit does not fire on an empty partition spec): the
    race is orderBy().limit(k) = TakeOrdered, with the rank window
    running over only the k-row result."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.textops import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5 + 1.0).alias("w")
    )
    out = weighted_sample(df, 20, "w")
    tree = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in tree


def test_doc_chunks_randomized_vs_reference(spark):
    """Batched randomized equivalence: one Spark job over 60 random
    (n, chunk, overlap=fixed-per-config) docs vs a pure-python strided
    reference — coverage, overlap width, and exact chunk contents."""
    import random

    rng = random.Random(20240817)
    configs = [(16, 4), (7, 3), (64, 15)]
    for chunk, overlap in configs:
        stride = chunk - overlap
        docs = []
        for i in range(20):
            n = rng.randrange(0, 3 * chunk + 1)
            docs.append((i, " ".join(f"w{i}_{j}" for j in range(n))))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got: dict[int, list[str]] = {}
        for r in doc_chunks_collect(spark, df, chunk, overlap):
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"])
            )
        for i, text in docs:
            toks = text.split() if text else [""]
            if len(toks) <= chunk:
                exp = [(0, " ".join(toks))]
            else:
                n_chunks = 1 + -(-(len(toks) - chunk) // stride)
                exp = [
                    (
                        ci,
                        " ".join(toks[ci * stride: ci * stride + chunk]),
                    )
                    for ci in range(n_chunks)
                ]
            assert sorted(got[i]) == exp, (chunk, overlap, i)


def doc_chunks_collect(spark, df, chunk, overlap):
    from ocr_spark.operators.textops import doc_chunks

    return doc_chunks(df, chunk_tokens=chunk, overlap=overlap).collect()


def test_intra_doc_dedup_whale_path_equality(spark):
    """whale_lines=0 forces every doc through the mapInPandas linear
    fold; output must equal the in-row expression path exactly."""
    docs = [
        (1, "a\nb\na\nc\nb"),
        (2, "x\ny\nz"),
        (3, "\n".join(f"l{i % 37}" for i in range(300))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    inrow = {
        r["doc_id"]: tuple(r)
        for r in intra_doc_dedup(df, whale_lines=10**6).collect()
    }
    linear = {
        r["doc_id"]: tuple(r)
        for r in intra_doc_dedup(df, whale_lines=0).collect()
    }
    assert inrow == linear
    # a 50k-line whale routes through the linear path and is cheap
    whale = spark.createDataFrame(
        [(9, "\n".join(f"w{i % 101}" for i in range(50_000)))],
        "doc_id long, text string",
    )
    out = intra_doc_dedup(whale).collect()[0]
    assert out["n_lines"] == 50_000
    assert out["n_dropped"] == 50_000 - 101


def test_soft_sample_cluster_mass_in_race(spark):
    """dedup_weights -> weighted_sample composition: a cluster's total
    inclusion mass equals one unique doc's, so the sampled set is not
    dominated by duplicated content. Statistical check: with 50
    unique docs and one 50-member cluster (each weight 1/50), the
    top-25 race should draw overwhelmingly from the unique docs."""
    from ocr_spark.operators.dedup import dedup_weights
    from ocr_spark.operators.textops import weighted_sample

    rows = [(i, f"unique text {i}") for i in range(50)]
    rows += [(100 + i, "dup text") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wts = dedup_weights(df)
    out = weighted_sample(wts, k=25, weight_col="weight").collect()
    n_dup = sum(1 for r in out if r["doc_id"] >= 100)
    # expected ~25 * (1/51 cluster mass share per slot) ~ 0.5; allow
    # generous slack — the point is the cluster doesn't take ~half
    assert n_dup <= 5, n_dup
