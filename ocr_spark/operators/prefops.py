"""Preference-data construction operators (RLHF / DPO / RFT stage).

After SFT curation, the next pipeline stage a training-data engine
feeds is preference optimization: N scored candidate responses per
prompt become (chosen, rejected) pairs (DPO, Rafailov '23) or a
deduplicated top-k kept set (rejection-sampling fine-tuning, the
Llama-2 "best-of-N with a reward model" recipe). The input shape is
the scored-response relation (prompt_id, resp_id, text, score) — the
reference's per-record shape validation (README.md:21) applied one
level up, to the sampled-response unit.

Scale discipline: scores stay INTEGER end to end (the reward is a
calibrated integer in [0, 100]; same zero-float-risk construction as
score_normalize's n_chars scores), and the pair extraction is ONE
hash-agg with map-side partials — a struct min/max per prompt, never
a self-join of responses (the naive "pairs = responses x responses
WHERE a.score > b.score" is quadratic in N per prompt and a full
shuffle of the text twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_spark.operators.textops import _ensure_parallelism


def dpo_pairs(df: DataFrame, min_gap: int = 1) -> DataFrame:
    """Build one (chosen, rejected) preference pair per prompt from
    scored responses: chosen = highest score (ties -> smallest
    resp_id), rejected = lowest score (ties -> smallest resp_id);
    prompts whose score spread is below ``min_gap`` emit nothing (a
    pair with no margin teaches nothing — standard DPO data hygiene,
    and it also drops single-response prompts where chosen ==
    rejected).

    Returns (prompt_id, chosen_id, rejected_id, chosen_score,
    rejected_score, gap, chosen_text, rejected_text).

    Plan shape: ONE groupBy(prompt_id) hash-agg — lexicographic
    struct max/min give the argmax/argmin with their payloads in the
    same pass (max over (score, -resp_id, ...) breaks score ties
    toward the smaller id; resp_id is unique so the text field never
    participates in the comparison). Map-side partial aggregation
    means each input partition contributes at most one candidate
    struct per prompt to the shuffle.
    """
    best = F.max(
        F.struct(
            F.col("score").alias("s"),
            (-F.col("resp_id")).alias("nid"),
            F.col("resp_id").alias("rid"),
            F.col("text").alias("t"),
        )
    ).alias("b")
    worst = F.min(
        F.struct(
            F.col("score").alias("s"),
            F.col("resp_id").alias("rid"),
            F.col("text").alias("t"),
        )
    ).alias("w")
    agg = df.groupBy("prompt_id").agg(best, worst)
    return agg.select(
        "prompt_id",
        F.col("b.rid").alias("chosen_id"),
        F.col("w.rid").alias("rejected_id"),
        F.col("b.s").alias("chosen_score"),
        F.col("w.s").alias("rejected_score"),
        (F.col("b.s") - F.col("w.s")).alias("gap"),
        F.col("b.t").alias("chosen_text"),
        F.col("w.t").alias("rejected_text"),
    ).filter(F.col("gap") >= min_gap)


def rft_select(df: DataFrame, tau: int = 50, k: int = 2) -> DataFrame:
    """Rejection-sampling fine-tuning selection (Llama-2 style):
    per prompt, keep the top-``k`` responses scoring at least ``tau``,
    AFTER collapsing byte-identical response texts (N sampled
    completions repeat themselves; keeping two copies of one answer
    wastes the k budget). Within a duplicate-text group the highest
    score survives (ties -> smallest resp_id) — the same response
    rated twice keeps its best rating.

    Returns (prompt_id, resp_id, score, rk) with rk the 1-based rank
    by (score DESC, resp_id ASC).

    Scale shape: dedup is a hash-agg on (prompt_id, md5(text)) — the
    text itself never shuffles twice — and the literal-k rank filter
    compiles to WindowGroupLimit Partial+Final (the weighted_sample
    discipline: each input partition pre-trims to its local top-k
    before the exchange).
    """
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    deduped = (
        _ensure_parallelism(df).select(
            "prompt_id",
            fp.alias("fp"),
            F.struct(
                F.col("score").alias("s"),
                (-F.col("resp_id")).alias("nid"),
                F.col("resp_id").alias("rid"),
            ).alias("cand"),
        )
        .groupBy("prompt_id", "fp")
        .agg(F.max("cand").alias("best"))
        .select(
            "prompt_id",
            F.col("best.rid").alias("resp_id"),
            F.col("best.s").alias("score"),
        )
    )
    kept = deduped.filter(F.col("score") >= tau)
    w = Window.partitionBy("prompt_id").orderBy(
        F.col("score").desc(), F.col("resp_id").asc()
    )
    return kept.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


# Refusal-boilerplate markers, first match flags (lowercased scan) —
# the self-instruct/Alpaca postprocessing blocklist. The oracle
# generator imports this (the LICENSE_MARKERS discipline).
REFUSAL_MARKERS: list[str] = [
    "as an ai language model",
    "as an ai,",
    "i cannot assist with",
    "i'm sorry, but i can",
]

# Sentence-final completeness: . ! ? optionally followed by a closing
# straight/curly quote (codepoints escaped — repo unicode discipline).
# Shared with the oracle generator. Anchored with \z, NOT $: Java's
# $ matches BEFORE a trailing line terminator while RE2's does not —
# a response ending '.\n' would read complete on one engine only;
# \z is absolute end-of-text in both.
COMPLETE_RE: str = "[.!?][\"\u201d\u2019]?\\z"


def instruction_filter(
    df: DataFrame,
    min_inst: int = 3,
    max_inst: int = 64,
) -> DataFrame:
    """Instruction-data heuristics (the self-instruct / Alpaca
    postprocessing pass, Wang '22): per (doc_id, instruction,
    response) row, flag

    - len_ok       instruction length in [min_inst, max_inst]
                   whitespace tokens
    - not_refusal  response carries no refusal boilerplate
                   (:data:`REFUSAL_MARKERS`, lowercased contains)
    - complete     response ends in sentence-final punctuation
                   (. ! ? or a closing quote after one) — the cheap
                   mid-generation-truncation detector
    - distinct     response is not byte-equal to the instruction
                   (echo degenerate)

    plus ``kept`` = all four. Flags are 0/1 ints; pure map, zero
    shuffle, `contains`/one anchored regex — codegen-friendly.
    """
    inst = F.coalesce(F.col("instruction"), F.lit(""))
    inst_n = F.when(F.trim(inst) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(inst), r"\s+"))
    )
    low = F.lower(F.coalesce(F.col("response"), F.lit("")))
    refusal = None
    for m in REFUSAL_MARKERS:
        c = low.contains(m)
        refusal = c if refusal is None else (refusal | c)
    complete = F.coalesce(F.col("response"), F.lit("")).rlike(
        COMPLETE_RE
    )
    out = _ensure_parallelism(df).select(
        "doc_id",
        inst_n.alias("inst_tokens"),
        (
            (inst_n >= min_inst) & (inst_n <= max_inst)
        ).cast("int").alias("len_ok"),
        (~refusal).cast("int").alias("not_refusal"),
        complete.cast("int").alias("complete"),
        (
            F.coalesce(F.col("response"), F.lit("")) != inst
        ).cast("int").alias("distinct_resp"),
    )
    return out.withColumn(
        "kept",
        F.col("len_ok")
        * F.col("not_refusal")
        * F.col("complete")
        * F.col("distinct_resp"),
    )


def win_matrix(df: DataFrame) -> DataFrame:
    """Arena-style pairwise win-rate matrix over scored responses
    tagged with the MODEL that produced them (the side-by-side
    evaluation sheet reward-model pipelines maintain; Chatbot-Arena
    publishes exactly this aggregation upstream of Elo): for every
    prompt where models a and b both answered, compare their BEST
    scores and tally a win, loss or tie.

    Input: (prompt_id, resp_id, model, score). Returns one row per
    unordered model pair (model_a < model_b lexicographically):
    (model_a, model_b, wins_a, wins_b, ties, n_prompts).

    Scale shape: first a (prompt, model) hash-agg collapses multiple
    responses to the model's best score (map-side partials — the raw
    response stream never self-joins), then the within-prompt pair
    join runs on the collapsed relation: per prompt it is C(m, 2)
    rows with m = model count, a CONSTANT, so the join output is
    O(prompts), and the final matrix agg is model-pair-sized. Integer
    scores and counts end to end.
    """
    best = df.groupBy("prompt_id", "model").agg(
        F.max("score").alias("score")
    )
    a = best.select(
        "prompt_id",
        F.col("model").alias("model_a"),
        F.col("score").alias("score_a"),
    )
    b = best.select(
        "prompt_id",
        F.col("model").alias("model_b"),
        F.col("score").alias("score_b"),
    )
    pairs = a.join(b, "prompt_id").filter(
        F.col("model_a") < F.col("model_b")
    )
    return pairs.groupBy("model_a", "model_b").agg(
        F.count(
            F.when(F.col("score_a") > F.col("score_b"), 1)
        ).alias("wins_a"),
        F.count(
            F.when(F.col("score_a") < F.col("score_b"), 1)
        ).alias("wins_b"),
        F.count(
            F.when(F.col("score_a") == F.col("score_b"), 1)
        ).alias("ties"),
        F.count(F.lit(1)).alias("n_prompts"),
    )


def elo_fit(matrix: DataFrame, iters: int = 3) -> DataFrame:
    """Bradley-Terry strength ratings from a pairwise win matrix via
    the MM algorithm (Hunter '04) — the fit Chatbot-Arena-style
    leaderboards run on exactly :func:`win_matrix`'s output. Update
    per iteration: gamma_a <- W_a / sum_b n_ab / (gamma_a + gamma_b),
    with W_a = wins + ties/2 (a tie is half a win each, the standard
    extension); after every update ratings renormalize against a
    deterministic ANCHOR — the model with the largest W (ties ->
    lexicographically smallest name) — rather than a geometric mean
    (a cross-model product is order-dependent; one division by the
    anchor's rating is not, and the anchor provably has wins so it
    never divides by zero; zero-win models legitimately converge
    toward rating 0, the BT MLE boundary).

    Returns (model, rating, elo) — rating the anchored gamma, elo =
    400 * log10(rating) — both float32.

    Cross-engine float contract (the pagerank/HITS discipline): W_a
    sums half-integers (exact in any order); the denominator sum is
    an engine-order double reduction absorbed by the per-iteration
    float32 cast; ratings re-enter the next iteration as float32
    fixed points, so both engines iterate on bit-identical inputs.

    Scale shape: everything downstream of win_matrix is model-pair-
    sized (tiny); joins broadcast, one localCheckpoint per iteration
    cuts the iterative lineage (the pagerank convention).
    """
    fwd = matrix.select(
        F.col("model_a").alias("m"),
        F.col("model_b").alias("o"),
        (
            F.col("wins_a").cast("double")
            + F.col("ties").cast("double") * 0.5
        ).alias("w"),
        F.col("n_prompts").alias("n"),
    )
    rev = matrix.select(
        F.col("model_b").alias("m"),
        F.col("model_a").alias("o"),
        (
            F.col("wins_b").cast("double")
            + F.col("ties").cast("double") * 0.5
        ).alias("w"),
        F.col("n_prompts").alias("n"),
    )
    pairs = fwd.unionByName(rev).localCheckpoint()
    totals = pairs.groupBy("m").agg(F.sum("w").alias("W"))
    anchor = totals.agg(
        F.min(
            F.struct((-F.col("W")).alias("nw"), F.col("m").alias("a"))
        ).alias("s")
    ).select(F.col("s.a").alias("_anchor"))
    g = totals.select(
        "m", F.lit(1.0).cast("float").alias("rating")
    ).localCheckpoint()
    for _ in range(iters):
        ga = g.select(
            F.col("m"), F.col("rating").alias("_ra")
        )
        gb = g.select(
            F.col("m").alias("o"), F.col("rating").alias("_rb")
        )
        den = (
            pairs.join(F.broadcast(ga), "m")
            .join(F.broadcast(gb), "o")
            .groupBy("m")
            .agg(
                F.sum(
                    F.col("n").cast("double")
                    / (
                        F.col("_ra").cast("double")
                        + F.col("_rb").cast("double")
                    )
                ).alias("den")
            )
        )
        raw = totals.join(den, "m").select(
            "m", (F.col("W") / F.col("den")).alias("_raw")
        )
        anch = raw.join(
            F.broadcast(anchor),
            raw["m"] == F.col("_anchor"),
        ).select(F.col("_raw").alias("_anchor_raw"))
        g = (
            raw.crossJoin(F.broadcast(anch))
            .select(
                "m",
                (F.col("_raw") / F.col("_anchor_raw"))
                .cast("float")
                .alias("rating"),
            )
            .localCheckpoint()
        )
    # zero-win models sit AT the BT MLE boundary (rating 0): their
    # elo is NULL, not -inf — and the guard is load-bearing
    # cross-engine (Spark log10(0) returns NULL, DuckDB ERRORS; the
    # zipf_fit degenerate-variance policy).
    return g.select(
        F.col("m").alias("model"),
        "rating",
        F.when(
            F.col("rating") > 0,
            F.lit(400.0) * F.log10(F.col("rating").cast("double")),
        )
        .cast("float")
        .alias("elo"),
    )
