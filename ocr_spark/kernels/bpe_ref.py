"""Pure-Python BPE reference (Spark-free golden oracle, repo kernel
convention): byte-pair-encoding tokenizer training and encoding in the
Sennrich et al. ACL '16 / GPT-2 style, operating on whitespace
pre-tokens (no end-of-word marker — encode runs per pre-token).

Determinism contract (both this kernel and the Spark operator):
merge selection is argmax by (count DESC, pair lexicographic ASC), so
ties never depend on dict ordering; encoding merges ALL occurrences of
the lowest-rank applicable pair per step (the GPT-2 rule).
"""

from __future__ import annotations


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word->frequency table.

    Stops early when no adjacent pair remains (every word fused to a
    single symbol).
    """
    vocab = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        fused = best[0] + best[1]
        for w, syms in vocab.items():
            i, out = 0, []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one pre-token: repeatedly merge ALL occurrences of the
    lowest-rank pair present until no learned pair applies."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        fused = best_pair[0] + best_pair[1]
        i, out = 0, []
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == best_pair[0]
                and syms[i + 1] == best_pair[1]
            ):
                out.append(fused)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Whitespace pre-tokenize (lowercased, matching the corpus word
    counting) then BPE-encode each pre-token."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out: list[str] = []
    for w in text.lower().split():
        out.extend(encode_word(w, ranks))
    return out
