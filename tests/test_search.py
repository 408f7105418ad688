"""Semantics pins for the lexical retrieval operators (BM25, TF-IDF)
and derived-rate domain rebalancing, on hand-built corpora. Cross-engine
value checks live in the driver contract (bm25_topk / tfidf_keywords /
domain_mix oracles)."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.search import bm25_topk, tfidf_keywords
from ocr_spark.operators.textops import domain_mix


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_bm25_rare_term_outranks_common(spark):
    # "zebra" appears in one doc, "cat" in three: for one occurrence
    # each at equal doc length, the zebra doc must score higher.
    docs = _docs(
        spark,
        [
            "cat dog bird fish",
            "cat dog fish bird",
            "zebra dog bird fish",
            "cat bird dog fish",
        ],
    )
    out = bm25_topk(docs, ["cat", "zebra"], k=4).collect()
    scores = {r.doc_id: r.bm25 for r in out}
    assert scores[2] > scores[0]
    # equal-length, equal-tf cat docs tie exactly
    assert scores[0] == scores[1] == scores[3]


def test_bm25_tf_saturates_not_linear(spark):
    # Double tf must raise the score by LESS than 2x (the k1 saturation
    # that distinguishes BM25 from raw tf weighting). Same doc length so
    # only tf varies.
    docs = _docs(
        spark,
        [
            "cat dog bird fish mouse horse",
            "cat cat dog bird fish mouse",
            "dog bird fish mouse horse goat",
        ],
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["cat"], k=3).collect()}
    assert 2 not in out  # no match -> no row
    assert out[1] > out[0]
    assert out[1] < 2 * out[0]


def test_bm25_length_normalization(spark):
    # Same tf=1, longer doc scores lower (b > 0).
    docs = _docs(
        spark,
        [
            "cat dog",
            "cat dog bird fish mouse horse goat pig hen cow",
        ],
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["cat"], k=2).collect()}
    assert out[0] > out[1]


def test_bm25_k_caps_and_orders(spark):
    docs = _docs(spark, [f"cat {'pad ' * i}dog" for i in range(6)])
    out = bm25_topk(docs, ["cat"], k=3).collect()
    assert len(out) == 3
    # shortest docs score highest -> doc_ids 0,1,2 in order
    assert [r.doc_id for r in out] == [0, 1, 2]


def test_bm25_matches_closed_form(spark):
    # One query term, hand-computed Okapi BM25 with the Lucene idf.
    docs = _docs(spark, ["cat dog", "dog bird", "dog fish"])
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["cat"], k=3).collect()}
    n_docs, df, tf, dl, avgdl, k1, b = 3, 1, 1, 2, 2.0, 1.2, 0.75
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    expect = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    assert out[0] == pytest.approx(round(expect, 4), abs=1e-9)
    assert set(out) == {0}


def test_tfidf_excludes_stopwords_and_ranks(spark):
    docs = _docs(
        spark,
        [
            "the zebra zebra lion and the lion lion habitat",
            "the lion habitat and the water",
            "water water and the river",
        ],
    )
    out = tfidf_keywords(docs, k=2)
    rows = out.collect()
    terms = {r.term for r in rows}
    assert "the" not in terms and "and" not in terms
    doc0 = sorted(
        [r for r in rows if r.doc_id == 0], key=lambda r: r.rank
    )
    # zebra: tf=2, df=1 -> 2*ln(3); lion: tf=3, df=2 -> 3*ln(1.5)
    assert doc0[0].term == "zebra"
    assert doc0[0].tfidf == pytest.approx(round(2 * math.log(3.0), 4))
    assert doc0[1].term == "lion"
    # every doc emits at most k rows, ranks are 1..k
    counts = {r.doc_id for r in rows}
    for d in counts:
        ranks = sorted(r.rank for r in rows if r.doc_id == d)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2


def _domain_docs(spark, spec):
    # spec: {domain: [token_counts per doc]}
    rows = []
    i = 0
    for dom, sizes in spec.items():
        for n in sizes:
            rows.append({"doc_id": i, "source": dom, "text": "w " * n})
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_domain_mix_under_budget_domain_keeps_all(spark):
    docs = _domain_docs(
        spark, {"small": [10, 10], "big": [500] * 40}
    )
    out = domain_mix(docs, 100.0).collect()
    small = [r for r in out if r.source == "small"]
    big = [r for r in out if r.source == "big"]
    # small: 20 tokens <= 100 budget -> rate 1.0 -> every row survives
    assert len(small) == 2
    # big: 20000 tokens, rate 0.005 -> thinned hard (floor(0.005*65536)
    # = 327 of 65536 selector values); with 40 docs expect near-zero
    assert len(big) < 40
    assert all(r.domain_tokens == 20000 for r in big) or not big


def test_domain_mix_deterministic_and_subset(spark):
    docs = _domain_docs(spark, {"a": [50] * 30, "b": [10] * 5})
    out1 = sorted(r.doc_id for r in domain_mix(docs, 300.0).collect())
    out2 = sorted(r.doc_id for r in domain_mix(docs, 300.0).collect())
    assert out1 == out2  # same hash selector -> identical sample
    # a smaller budget selects a subset (nested-rate property of the
    # threshold selector)
    smaller = sorted(r.doc_id for r in domain_mix(docs, 150.0).collect())
    assert set(smaller) <= set(out1)


def test_domain_mix_broadcast_plan(spark):
    docs = _domain_docs(spark, {"a": [5] * 4, "b": [5] * 4})
    plan = domain_mix(docs, 10.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_unigram_logprob_closed_form(spark):
    from ocr_spark.operators.textops import unigram_logprob

    docs = _docs(spark, ["a a b"])
    out = unigram_logprob(docs).collect()
    assert len(out) == 1 and out[0].n_tokens == 3
    expect = (2 * math.log(2 / 3) + math.log(1 / 3)) / 3
    assert out[0].avg_logprob == pytest.approx(round(expect, 4), abs=1e-9)


def test_unigram_logprob_rare_tokens_score_lower(spark):
    from ocr_spark.operators.textops import unigram_logprob

    docs = _docs(
        spark,
        ["cat cat cat cat", "cat cat cat cat", "ultrarare singleton"],
    )
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs).collect()}
    assert out[2] < out[0] == out[1]


def test_bigram_logprob_closed_form(spark):
    from ocr_spark.operators.textops import bigram_logprob

    # corpus bigrams: (x,y) x3, (y,x) x2, (y,y) x1 -> c_left(x)=3,
    # c_left(y)=3; unigrams: x3 y5, T=8
    docs = _docs(spark, ["x y x y x y", "y y"])
    out = {r.doc_id: r for r in bigram_logprob(docs, lam=0.7).collect()}
    assert out[0].n_bigrams == 5 and out[1].n_bigrams == 1
    p_xy = 0.7 * (3 / 3) + 0.3 * (5 / 8)
    p_yx = 0.7 * (2 / 3) + 0.3 * (3 / 8)
    p_yy = 0.7 * (1 / 3) + 0.3 * (5 / 8)
    e0 = (3 * math.log(p_xy) + 2 * math.log(p_yx)) / 5
    assert out[0].avg_logprob2 == pytest.approx(round(e0, 4), abs=1e-9)
    assert out[1].avg_logprob2 == pytest.approx(
        round(math.log(p_yy), 4), abs=1e-9
    )


def test_bigram_logprob_order_sensitivity(spark):
    """The property unigram LMs cannot have: a token-identical doc in
    scrambled order scores LOWER than the dominant fluent order."""
    from ocr_spark.operators.textops import bigram_logprob, unigram_logprob

    fluent = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy jumps the brown fox"
    docs = _docs(spark, [fluent] * 8 + [scrambled])
    bi = {r.doc_id: r.avg_logprob2 for r in bigram_logprob(docs).collect()}
    uni = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs).collect()}
    assert uni[8] == uni[0], "unigram LM is order-blind"
    assert bi[8] < bi[0], "bigram LM penalizes scrambled order"
    # short/empty docs drop (no qualifying bigram)
    docs2 = _docs(spark, ["a b", "", "solo"])
    assert [r.doc_id for r in bigram_logprob(docs2).collect()] == [0]


def test_js_divergence_identity_disjoint_symmetry(spark):
    """JSD = 0 for identical distributions, ln(2) for disjoint
    vocabularies, symmetric under group swap, and strictly between for
    partial overlap."""
    import math

    from ocr_spark.operators.textops import js_divergence

    rows = [
        (0, "a b c a", "g1"),
        (1, "a b c a", "g2"),      # g2 identical to g1
        (2, "x y z x", "g3"),      # g3 disjoint from g1
        (3, "a b x y", "g4"),      # g4 half-overlaps g1
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )

    def jsd(a, b):
        return js_divergence(docs, a, b).collect()[0]

    same = jsd("g1", "g2")
    assert same.jsd == 0.0
    assert same.n_vocab == 3 and same.tokens_a == 4
    disj = jsd("g1", "g3")
    assert disj.jsd == round(math.log(2.0), 6)
    assert disj.n_vocab == 6
    part = jsd("g1", "g4")
    assert 0.0 < part.jsd < round(math.log(2.0), 6)
    assert jsd("g4", "g1").jsd == part.jsd, "symmetric"


def test_oov_rate_vocab_boundary_and_rates(spark):
    """OOV rate against the corpus's own top-V vocabulary: counts and
    rates match hand computation, the V boundary tie-breaks by term
    asc at equal count, and a token-less doc drops."""
    from ocr_spark.operators.textops import oov_rate

    # counts: a=4, b=3, c=3, d=1 -> top-3 vocab {a, b, c} (c beats d
    # on count; b/c tie broken irrelevant here). With V=2: {a, b}
    # (b beats c on the term-asc tie-break at count 3).
    docs = _docs(spark, ["a a b c", "a b c d", "a b c", ""])
    out3 = {r.doc_id: r for r in oov_rate(docs, vocab_size=3).collect()}
    assert set(out3) == {0, 1, 2}, "empty doc drops"
    assert (out3[0].n_tokens, out3[0].n_oov) == (4, 0)
    assert (out3[1].n_tokens, out3[1].n_oov) == (4, 1)  # d is OOV
    assert out3[1].oov_rate == pytest.approx(0.25, abs=1e-12)
    assert (out3[2].n_tokens, out3[2].n_oov) == (3, 0)
    out2 = {r.doc_id: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert (out2[2].n_tokens, out2[2].n_oov) == (3, 1)  # c fell out
    assert out2[1].n_oov == 2  # c and d


def test_kn_logprob_closed_form_and_normalization(spark):
    """Interpolated Kneser-Ney: per-doc averages match a hand-built
    python reference on a tiny corpus, and the conditional distribution
    sums EXACTLY to 1 over the vocabulary (the discount mass
    D*n_cont/c_left funds the continuation backoff — the property that
    makes KN a proper LM and JM's raw-unigram mix its inferior)."""
    from ocr_spark.operators.textops import kn_logprob

    # bigrams: (x,y) x3, (y,x) x2, (y,y) x1
    docs = _docs(spark, ["x y x y x y", "y y"])
    out = {r.doc_id: r for r in kn_logprob(docs, discount=0.75).collect()}
    assert out[0].n_bigrams == 5 and out[1].n_bigrams == 1

    D = 0.75
    cab = {("x", "y"): 3, ("y", "x"): 2, ("y", "y"): 1}
    cleft = {"x": 3, "y": 3}
    n_cont = {"x": 1, "y": 2}
    n_left = {"x": 1, "y": 2}
    b_types = 3

    def p(v, w):
        return max(cab[(v, w)] - D, 0.0) / cleft[v] + (
            D * n_cont[v] / cleft[v]
        ) * (n_left[w] / b_types)

    e0 = (3 * math.log(p("x", "y")) + 2 * math.log(p("y", "x"))) / 5
    assert out[0].avg_kn_logprob == pytest.approx(round(e0, 4), abs=1e-9)
    assert out[1].avg_kn_logprob == pytest.approx(
        round(math.log(p("y", "y")), 4), abs=1e-9
    )
    # closed-form normalization over the full vocab {x, y}
    for v in ("x", "y"):
        mass = sum(
            p(v, w) for w in ("x", "y") if (v, w) in cab
        ) + sum(
            (D * n_cont[v] / cleft[v]) * (n_left[w] / b_types)
            for w in ("x", "y") if (v, w) not in cab
        )
        assert mass == pytest.approx(1.0, abs=1e-12)


def test_kn_logprob_discounts_stock_phrase_backoff(spark):
    """The KN-vs-JM separation case: 'francisco' occurs ONLY after
    'san' (high unigram count, a single left context). JM's unigram
    backoff rewards a novel bigram ending in 'francisco'; KN's
    continuation probability — one distinct left context — scores it
    below an equally-frequent word seen after many contexts."""
    from ocr_spark.operators.textops import bigram_logprob, kn_logprob

    corpus = ["san francisco " * 6 + "of course", "of late of note of old"]
    # probe doc: novel-context bigrams "note francisco" vs "note of"
    # never occur in the probe's own doc... they must exist to be
    # scored (train==score corpus), so plant one of each
    docs = _docs(spark, corpus + ["late francisco", "late of"])
    kn = {r.doc_id: r.avg_kn_logprob for r in kn_logprob(docs).collect()}
    jm = {r.doc_id: r.avg_logprob2
          for r in bigram_logprob(docs).collect()}
    # 'francisco' unigram count (7) > 'of' (5), so JM backoff ranks
    # the francisco-continuation at least as well as... assert the
    # DIRECTIONAL flip: KN penalizes the one-context word harder than
    # JM does, relative to the many-context word
    assert (kn[2] - kn[3]) < (jm[2] - jm[3])
    assert kn[2] < kn[3], "one-context continuation scores lower"


def test_dsir_prefers_target_like_docs(spark):
    """DSIR importance weights: raw docs sharing the target domain's
    hashed-ngram profile outscore off-domain docs, and the Gumbel
    top-k is deterministic across calls."""
    from ocr_spark.operators.textops import dsir_logweights, dsir_sample

    a_text = "alpha beta gamma alpha beta"
    b_text = "delta epsilon zeta delta epsilon"
    raw = _docs(spark, [a_text] * 10 + [b_text] * 10)
    target = spark.createDataFrame(
        [(100 + i, a_text) for i in range(5)], "doc_id long, text string"
    )
    w = {
        r.doc_id: r.logw for r in dsir_logweights(raw, target).collect()
    }
    assert len(w) == 20
    assert min(w[i] for i in range(10)) > max(w[i] for i in range(10, 20))
    s1 = [r.doc_id for r in dsir_sample(raw, target, k=8).collect()]
    s2 = [r.doc_id for r in dsir_sample(raw, target, k=8).collect()]
    assert s1 == s2, "deterministic Gumbel: same sample every run"
    # weight gap dominates the bounded Gumbel noise here: all selected
    # docs are target-like
    assert all(i < 10 for i in s1)


def test_pmi_bigrams_collocation_beats_chance(spark):
    from ocr_spark.operators.textops import pmi_bigrams

    # "new york" always adjacent; "dog"/"fish" co-occur only by chance
    # within a shuffled filler stream.
    texts = ["new york dog cat fish bird"] * 6 + [
        "dog bird fish cat",
        "fish dog cat bird",
    ]
    docs = _docs(spark, texts)
    out = pmi_bigrams(docs, min_count=5, k=10).collect()
    pairs = {(r.term_a, r.term_b): r.pmi for r in out}
    assert ("new", "york") in pairs
    assert pairs[("new", "york")] == max(pairs.values())
    # min_count floor: a pair seen fewer than 5 times never appears
    assert all(r.c_ab >= 5 for r in out)


def test_pmi_bigrams_single_token_docs_contribute_nothing(spark):
    from ocr_spark.operators.textops import pmi_bigrams

    # Spark's sequence(1, 0) is DESCENDING [1, 0]; the size>=2 guard
    # must keep single-token docs from fabricating bigrams.
    docs = _docs(spark, ["solo"] * 8 + ["pair here"] * 5)
    out = pmi_bigrams(docs, min_count=5, k=10).collect()
    assert [(r.term_a, r.term_b, r.c_ab) for r in out] == [
        ("pair", "here", 5)
    ]


def test_pmi_and_logprob_invariant_under_corpus_duplication(spark):
    """Exact scale-invariance: duplicating every document doubles all
    counts (c_ab, c_a, B, T) so PMI ratios and unigram probabilities
    cancel unchanged — a strong correctness pin on the normalization
    terms (a missing total or a swapped numerator breaks it)."""
    from ocr_spark.operators.textops import pmi_bigrams, unigram_logprob

    texts = [
        "neural network training data pipeline",
        "training data quality matters most",
        "neural network inference at scale",
    ]
    docs = _docs(spark, texts)
    docs2 = _docs(spark, texts + texts)

    p1 = {
        (r.term_a, r.term_b): r.pmi
        for r in pmi_bigrams(docs, min_count=1, k=100).collect()
    }
    p2 = {
        (r.term_a, r.term_b): r.pmi
        for r in pmi_bigrams(docs2, min_count=1, k=100).collect()
    }
    assert p1 == p2

    l1 = sorted(
        (r.doc_id % 3, r.n_tokens, r.avg_logprob)
        for r in unigram_logprob(docs).collect()
    )
    l2 = sorted(
        set(
            (r.doc_id % 3, r.n_tokens, r.avg_logprob)
            for r in unigram_logprob(docs2).collect()
        )
    )
    assert l1 == l2


def test_bm25_score_monotone_in_idf_rarity(spark):
    """Adding more docs that contain the term lowers every matching
    doc's score (df rises -> idf falls), holding the matching docs'
    tf/dl fixed. Pins the idf direction."""
    base = ["cat dog bird fish", "dog bird fish mouse"]
    extra = ["cat mouse goat hen"]
    d1 = _docs(spark, base)
    d2 = _docs(spark, base + extra)
    s1 = {r.doc_id: r.bm25 for r in bm25_topk(d1, ["cat"], k=5).collect()}
    s2 = {r.doc_id: r.bm25 for r in bm25_topk(d2, ["cat"], k=5).collect()}
    assert s2[0] < s1[0]
