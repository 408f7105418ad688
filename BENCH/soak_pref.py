#!/usr/bin/env python
"""Preference/mixing-family soak: dpo_pairs + temperature_sample +
span_corruption at 2M rows, checked EXACTLY against python references.

Corpus (deterministic arithmetic, no RNG, generated in-Spark):

- dpo leg: 2M scored responses over 500k prompts (4 each), reward =
  (i*i) % 97 (quadratic residues cluster, so ~0.7% of prompts
  genuinely land under the min_gap and the drop branch is exercised), text from a 17-string pool (ties
  and duplicate texts both occur). The FULL 500k-row pair table (chosen/rejected
  ids, scores, gap after the min_gap=10 filter) must equal a python
  argmax/argmin loop exactly — tie rules included.
- temperature leg: 2M docs, one dominant group (55%) plus 19 uniform
  tail groups. Targets/thresholds recomputed in python from exact
  counts (isqrt weights, BIGINT arithmetic); the KEPT SET must equal
  the python md5-selector loop exactly (~budget rows), and every
  surviving row's (n_docs, target) must match.
- checksum leg: 2M rows -> the FULL 64-shard manifest (counts, char
  totals, order-independent digest sums) equals a python loop doing
  the same 2 md5s per row, exactly.
- win leg: 2M responses over 250k prompts x 4 models (2 responses
  each) -> the full 6-row pairwise win/loss/tie matrix equals a
  python double loop exactly.
- conv leg: 160k unique 8-turn conversations + a mangled-opener
  remix of every 80th (2k planted near-dups, J = 5/7 after one turn
  flips one of six 3-gram turn-shingles): the found pair set must be
  a subset of the planted set with recall >= 0.995 and ZERO false
  pairs (unique per-conv turn texts -> unrelated convs share no
  turn fingerprint, so any false candidate dies at verification).
- span leg: 2M docs with 1 + (i*7) % 60 tokens. Exact per-doc
  (masked, spans) equality vs the python md5 reference on the
  doc_id % 40 == 0 sample (50k docs); corpus-wide: row count, the
  enc/tgt identities, and the realized mask density within 6 sigma
  of 15%.

NOTE workers re-import this module with argv='pyspark.worker' — keep
the argv parse inside main() (soak-generator guard, r5 lesson).

Measured (degraded-window box, 2026-08-18): dpo 12.5s (463,916 pairs
exact, 36,084 dropped); temperature 5.0s (200,160 kept exact, g0
share 0.202); span 72.8s incl. two full executions (was 168.3s with
the in-row HOF form — the posexplode+codegen rewrite's 2M-doc
datapoint; sample-of-50k exact, density 0.15007); checksum 2.2s
(64-shard manifest exact); win 2.9s (6-pair matrix exact, ties > 0);
conv 30.7s (1995/2000 planted pairs, recall 0.9975 — consistent with
the ~0.5^8 per-pair all-bands-die probability at 6 shingles — ZERO
false pairs).
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 2_000_000
PROMPTS = N // 4
BUDGET = 200_000
DENSITY = 15
SPAN = 3


def _sel16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ocr_spark.operators.prefops import dpo_pairs
    from ocr_spark.operators.textops import (
        span_corruption,
        temperature_sample,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-pref")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {}

    # ---- dpo_pairs ----
    t0 = time.time()
    resp = spark.range(N).select(
        F.expr("id div 4").alias("prompt_id"),
        F.col("id").alias("resp_id"),
        F.concat(F.lit("resp "), F.col("id") % 17).alias("text"),
        ((F.col("id") * F.col("id")) % 97).alias("score"),
    )
    got = {
        r["prompt_id"]: (
            r["chosen_id"],
            r["rejected_id"],
            r["chosen_score"],
            r["rejected_score"],
            r["gap"],
        )
        for r in dpo_pairs(resp, min_gap=10).collect()
    }
    res["dpo_s"] = round(time.time() - t0, 1)
    exp = {}
    for p in range(PROMPTS):
        ids = range(4 * p, 4 * p + 4)
        scores = {i: (i * i) % 97 for i in ids}
        # chosen: max score, tie -> min id; rejected: min score, tie
        # -> min id (both loops scan ascending ids, so strict
        # comparisons keep the first = smallest id)
        c = max(ids, key=lambda i: (scores[i], -i))
        w = min(ids, key=lambda i: (scores[i], i))
        gap = scores[c] - scores[w]
        if gap >= 10:
            exp[p] = (c, w, scores[c], scores[w], gap)
    assert len(got) == len(exp)
    assert got == exp, "dpo pair table diverged"
    res["dpo_pairs"] = len(got)
    res["dpo_prompts_dropped"] = PROMPTS - len(got)
    assert res["dpo_prompts_dropped"] > 0  # low-gap prompts exist

    # ---- temperature_sample ----
    t0 = time.time()
    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 < 55, "g0")
        .otherwise(F.concat(F.lit("g"), 1 + F.col("id") % 19))
        .alias("grp"),
    )
    kept = temperature_sample(
        docs, budget=BUDGET, domain_col="grp", key_col="doc_id"
    ).collect()
    res["temp_s"] = round(time.time() - t0, 1)

    def grp_of(i: int) -> str:
        return "g0" if i % 100 < 55 else f"g{1 + i % 19}"

    counts: dict[str, int] = {}
    for i in range(N):
        counts[grp_of(i)] = counts.get(grp_of(i), 0) + 1
    w = {g: math.isqrt(n) for g, n in counts.items()}
    wt = sum(w.values())
    target = {
        g: min(counts[g], BUDGET * w[g] // wt) for g in counts
    }
    thr = {g: target[g] * 65536 // counts[g] for g in counts}
    exp_kept = {
        i
        for i in range(N)
        if _sel16(f"{i}#ts") < thr[grp_of(i)]
    }
    got_ids = {r["doc_id"] for r in kept}
    assert got_ids == exp_kept, (
        len(got_ids - exp_kept),
        len(exp_kept - got_ids),
    )
    for r in kept:
        assert r["n_docs"] == counts[r["grp"]]
        assert r["target"] == target[r["grp"]]
    res["temp_kept"] = len(got_ids)
    res["temp_groups"] = len(counts)
    # the dominant group's kept share must sit well under its 55%
    # corpus share (that's the point of temperature sampling)
    g0_share = sum(1 for i in got_ids if grp_of(i) == "g0") / len(
        got_ids
    )
    res["temp_g0_share"] = round(g0_share, 4)
    assert g0_share < 0.30, g0_share

    # ---- span_corruption ----
    t0 = time.time()
    sdocs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, "
            "CAST(1 + (id * 7) % 60 AS INT)), x -> 'w'), ' ')"
        ).alias("text"),
    )
    out = span_corruption(sdocs, density_pct=DENSITY, span=SPAN)
    agg = out.select(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_masked").alias("masked"),
        F.sum(
            (
                F.col("enc_len")
                - (
                    F.col("n_tokens")
                    - F.col("n_masked")
                    + F.col("n_spans")
                )
            )
            ** 2
        ).alias("enc_viol"),
        F.sum(
            ((F.col("tgt_len") - F.col("n_masked") - F.col("n_spans")))
            ** 2
        ).alias("tgt_viol"),
    ).collect()[0]
    sample = {
        r["doc_id"]: (r["n_masked"], r["n_spans"])
        for r in out.filter(F.col("doc_id") % 40 == 0).collect()
    }
    res["span_s"] = round(time.time() - t0, 1)
    assert agg["rows"] == N
    assert agg["enc_viol"] == 0 and agg["tgt_viol"] == 0
    # exact sample vs the python md5 reference
    for i in range(0, N, 40):
        n = 1 + (i * 7) % 60
        groups = (n + SPAN - 1) // SPAN
        masked = spans = prev = 0
        for g in range(groups):
            m = 1 if _sel16(f"{i}#sc{g}") % 100 < DENSITY else 0
            size = SPAN if g < groups - 1 else n - SPAN * g
            masked += m * size
            if m == 1 and prev == 0:
                spans += 1
            prev = m
        assert sample[i] == (masked, spans), i
    res["span_sample_docs"] = len(sample)
    # corpus-wide density within 6 sigma of 15% (group-level
    # Bernoulli; ~N*20.5/3 groups -> sigma tiny)
    n_groups_total = sum(
        ((1 + (i * 7) % 60) + SPAN - 1) // SPAN for i in range(0, 60)
    ) * (N // 60)
    p = DENSITY / 100
    sigma = math.sqrt(n_groups_total * p * (1 - p)) * SPAN
    density = agg["masked"] / agg["tok"]
    res["span_density"] = round(density, 5)
    assert abs(agg["masked"] - p * agg["tok"]) < 6 * sigma + 3 * N / 60

    # ---- conv_near_dup ----
    from ocr_spark.operators.convops import conv_near_dup

    N_CONV = 160_000
    t0 = time.time()
    base = spark.range(N_CONV * 8).select(
        F.expr("id div 8").alias("conv_id"),
        (F.col("id") % 8).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit("conv "), F.expr("id div 8"),
            F.lit(" turn "), F.col("id") % 8,
        ).alias("text"),
    )
    remix = base.filter(F.col("conv_id") % 80 == 0).select(
        (F.col("conv_id") + F.lit(1_000_000_000)).alias("conv_id"),
        "turn_idx",
        "role",
        F.when(
            F.col("turn_idx") == 0, F.concat(F.col("text"), F.lit(" zz"))
        ).otherwise(F.col("text")).alias("text"),
    )
    got_cn = {
        (r["doc_a"], r["doc_b"])
        for r in conv_near_dup(base.unionByName(remix)).collect()
    }
    res["conv_s"] = round(time.time() - t0, 1)
    planted = {
        (c, c + 1_000_000_000) for c in range(0, N_CONV, 80)
    }
    assert got_cn <= planted, "false near-dup conv pairs"
    recall = len(got_cn) / len(planted)
    res["conv_planted"] = len(planted)
    res["conv_recall"] = round(recall, 4)
    assert recall >= 0.995, recall

    # ---- shard_checksums ----
    from ocr_spark.operators.textops import shard_checksums

    t0 = time.time()
    cdocs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), F.col("id")).alias("text"),
    )
    got_cs = {
        r["shard"]: (r["n_docs"], r["n_chars"], r["checksum"])
        for r in shard_checksums(cdocs, shards=64).collect()
    }
    res["checksum_s"] = round(time.time() - t0, 1)
    exp_cs: dict[int, list[int]] = {}
    for i in range(N):
        txt = f"doc text {i}"
        sh = int(
            hashlib.md5(str(i).encode()).hexdigest()[:4], 16
        ) % 64
        dg = int(
            hashlib.md5(f"{i}#{txt}".encode()).hexdigest()[:8], 16
        )
        e = exp_cs.setdefault(sh, [0, 0, 0])
        e[0] += 1
        e[1] += len(txt)
        e[2] += dg
    assert got_cs == {k: tuple(v) for k, v in exp_cs.items()}
    res["checksum_shards"] = len(got_cs)

    # ---- win_matrix ----
    from ocr_spark.operators.prefops import win_matrix

    t0 = time.time()
    wresp = spark.range(N).select(
        F.expr("id div 8").alias("prompt_id"),
        F.col("id").alias("resp_id"),
        F.concat(F.lit("m"), F.col("id") % 4).alias("model"),
        (((F.col("id") * F.col("id")) + F.col("id") * 7) % 53).alias(
            "score"
        ),
    )
    got_wm = {
        (r["model_a"], r["model_b"]): (
            r["wins_a"],
            r["wins_b"],
            r["ties"],
            r["n_prompts"],
        )
        for r in win_matrix(wresp).collect()
    }
    res["win_s"] = round(time.time() - t0, 1)
    exp_wm: dict = {}
    for p_ in range(N // 8):
        best: dict[str, int] = {}
        for i in range(8 * p_, 8 * p_ + 8):
            m = f"m{i % 4}"
            sc = (i * i + i * 7) % 53
            if m not in best or sc > best[m]:
                best[m] = sc
        ms = sorted(best)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                a, b = ms[x], ms[y]
                e = exp_wm.setdefault((a, b), [0, 0, 0, 0])
                if best[a] > best[b]:
                    e[0] += 1
                elif best[a] < best[b]:
                    e[1] += 1
                else:
                    e[2] += 1
                e[3] += 1
    assert got_wm == {k: tuple(v) for k, v in exp_wm.items()}
    res["win_pairs"] = len(got_wm)
    assert all(v[2] > 0 for v in got_wm.values())  # ties occur

    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
