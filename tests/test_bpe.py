"""BPE trainer/encoder: the pure-Python kernel is the golden oracle
(classic Sennrich fixture hand-pinned), and the Spark operator must
agree with it exactly on both training and encoding."""

import pandas as pd

from ocr_spark.kernels.bpe_ref import encode_text, encode_word, train_bpe


def test_kernel_merges_sennrich_fixture():
    # the ACL'16 example: es/est fuse first (count 9), tie es-vs-st
    # breaks lexicographically
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("l", "o") in merges[2:] or ("w", "i") in merges[2:] or (
        "n", "e"
    ) in merges[2:]


def test_kernel_encode_applies_ranks_in_order():
    merges = [("a", "b"), ("ab", "c")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("abc", ranks) == ["abc"]
    assert encode_word("acb", ranks) == ["a", "c", "b"]
    # all occurrences of the best pair merge in one step
    assert encode_word("abab", ranks) == ["ab", "ab"]


def test_kernel_train_stops_when_fully_fused():
    merges = train_bpe({"ab": 3}, 10)
    assert merges == [("a", "b")]  # one merge possible, then no pairs


def test_spark_train_and_encode_match_kernel(spark):
    from ocr_spark.operators.bpe import bpe_encode_counts, train_bpe as t

    texts = [
        "the newest widest lowest",
        "lower and lower the newest",
        "widest of the wide world",
        "newest newest lowest wide",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    merges = t(docs, n_merges=12)

    # golden: train on the same word-frequency table in pure python
    freqs = {}
    for s in texts:
        for w in s.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    assert merges == train_bpe(freqs, 12)

    got = {r.doc_id: r.n_bpe for r in bpe_encode_counts(docs, merges).collect()}
    want = {i: len(encode_text(s, merges)) for i, s in enumerate(texts)}
    assert got == want
    # more merges never increase the token count
    fewer = {r.doc_id: r.n_bpe for r in bpe_encode_counts(docs, merges[:3]).collect()}
    assert all(got[i] <= fewer[i] for i in got)


def test_spark_train_vocab_cap_raises(spark):
    import pytest

    from ocr_spark.operators.bpe import train_bpe as t

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b c d e f g h"]})
    )
    with pytest.raises(ValueError, match="max_vocab"):
        t(docs, n_merges=2, max_vocab=3)
