"""BPE tokenizer training + encoding over the corpus.

The on-corpus half of tokenizer building (Sennrich et al. ACL '16;
the GPT-2 byte-level variant is the same algorithm over byte
pre-tokens). Split by data size, the way SentencePiece/HF trainers do:

- **Corpus-sized (distributed)**: the word-frequency table — one
  explode + hash-agg with map-side partials over every token in the
  corpus. This is the only pass that touches all the data; at 100 TB
  it is the whole cost.
- **Vocabulary-sized (driver)**: the merge loop. Each merge is a
  global argmax with a sequential dependency on the previous merge —
  inherently iterative, and it runs over the word-frequency TABLE, not
  the corpus. Zipf keeps that table small (even web-scale corpora have
  ~10^7-10^8 distinct pre-tokens); ``max_vocab`` fails fast instead of
  silently collecting an unbounded relation. The loop itself is the
  pure-Python kernel ``kernels/bpe_ref.py`` — the same code the tests
  use as the golden oracle, so Spark-vs-kernel equality is by
  construction and the tests pin the kernel's semantics.
- **Corpus-sized encode (distributed)**: applying trained merges is
  per-row — an Arrow-batched ``mapInPandas`` with the merge-rank dict
  shipped in the closure (broadcast by task serialization; a few MB
  even at 50k merges).

Not SQL-expressible (the sequential merge dependency), so the driver
query has no DuckDB oracle — the correctness evidence is the kernel
equality pytest plus the driver's rows-only check, the same pattern as
the other iterative op (connected components has a recursive-CTE
oracle only because label propagation is order-free; BPE is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_spark.kernels import bpe_ref
from ocr_spark.operators.textops import TOKENS_LC, _ensure_parallelism


def word_frequencies(df: DataFrame) -> DataFrame:
    """Corpus word-frequency table: (word, freq). The one full-corpus
    pass of BPE training."""
    return (
        _ensure_parallelism(df)
        .select(F.explode(F.expr(TOKENS_LC)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    df: DataFrame, n_merges: int = 50, max_vocab: int = 1_000_000
) -> list[tuple[str, str]]:
    """Learn BPE merges from the corpus. Returns the ordered merge list
    (rank = position). Raises when the distinct pre-token count exceeds
    ``max_vocab`` — raise the cap deliberately rather than letting an
    unbounded collect surprise the driver."""
    wf = word_frequencies(df)
    rows = wf.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; raise the cap "
            "(the merge loop is vocab-sized, so know the size first)"
        )
    freqs = {r.word: r.freq for r in rows}
    return bpe_ref.train_bpe(freqs, n_merges)


def bpe_encode_counts(
    df: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Token counts under a trained BPE: (doc_id, n_bpe). Arrow-batched
    map — no shuffle; the merge table rides the task closure."""
    merges = list(merges)

    def run(batches):
        ranks = {pair: i for i, pair in enumerate(merges)}
        # r6: memoize per-word encode lengths for the task lifetime —
        # encode_word is deterministic and the word vocabulary is
        # Zipf-small, so each task pays the merge loop once per
        # DISTINCT word instead of once per occurrence (guide §4.5;
        # measured 8.1s -> ~2s at sf1.0, identical counts)
        cache: dict[str, int] = {}

        def enc(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = len(bpe_ref.encode_word(w, ranks))
                cache[w] = n
            return n

        for pdf in batches:
            n = [
                sum(enc(w) for w in (t or "").lower().split())
                for t in pdf["text"]
            ]
            yield pdf[["doc_id"]].assign(n_bpe=n)

    return df.select("doc_id", "text").mapInPandas(
        run, "doc_id long, n_bpe long"
    )
