#!/usr/bin/env python
"""Mix/clean soak: token_budget_mix + intra_doc_dedup + unicode_clean
at 2M docs.

token_budget_mix over 2M docs x 16 domains (125k docs/domain, known
analytic token counts 20 + (id*7) % 50, budget 1M tokens/domain):
- realized budget EXACT: per domain, at most ONE kept row has
  cum_tokens >= budget (the crossing doc), and the max cum satisfies
  max_cum - its n_tokens < budget <= max_cum (budget reached,
  overshoot bounded by one document).
- kept-set EXACTNESS for two full domains vs a pure-python hashlib
  greedy over the same (md5(id), id) order \u2014 ids AND running sums
  compared row-for-row (~22k kept rows each).

intra_doc_dedup over 2M five-line docs with planted repeats (line 3
repeats line 1 on id%2==0, line 5 repeats line 2 on id%5==0; all other
lines are md5-unique so cross-position collisions are impossible):
- total dropped == the analytic plant count EXACTLY; rows preserved.
- text_clean EXACT vs a python first-occurrence reference on a 2k
  sample.

unicode_clean over the same corpus dirtied with BOM prefix,
zero-width-space after every 'e', and doubled-nbsp space replacement:
- clean(dirty) == original text for ALL 2M docs (md5 equality count)
  \u2014 the dirt is constructed entirely from strip/normalize classes.
- idempotence: clean(clean(dirty)) == clean(dirty) for all docs.

domain_upsample over 2M docs x 4 domains (factors 2.25 / 0.5 / 3.0 /
default 1.0): occurrence counts within 6 sigma of the analytic
binomial per domain, per-doc epoch contiguity 0..n-1 for ALL docs,
and a ~10k-doc sample EXACT vs the python '#up'-salted selector.

weighted_sample over 2M rows (weights 1..10, k=10k global): the
sampled ids AND their rank order EXACTLY equal a python
heapq-over-md5 reference of the same race; mean sampled weight >> the
population mean (inclusion-proportional-to-weight sanity).

All ops are map/one-window/TakeOrdered shapes; the soak pins
EXACTNESS at a scale where selector-width / tiebreak / regex-class
bugs cannot hide.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import SparkSession, Window, functions as F

    from ocr_spark.operators.dedup import intra_doc_dedup
    from ocr_spark.operators.textops import token_budget_mix, unicode_clean

    n_docs = 2_000_000
    n_domains = 16
    budget = 1_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-mix")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- token_budget_mix ----
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("dom"), (F.col("id") % n_domains)).alias(
                "source"
            ),
            F.trim(
                F.expr("repeat('w ', 20 + (id * 7) % 50)")
            ).alias("text"),
        )
        .repartition(64)
    )
    t0 = time.time()
    mix = token_budget_mix(docs, budget_tokens=budget).cache()
    per_dom = (
        mix.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("cum_tokens").alias("max_cum"),
            F.sum((F.col("cum_tokens") >= budget).cast("long")).alias(
                "n_at_or_over"
            ),
        )
        .collect()
    )
    t_mix = time.time() - t0
    assert len(per_dom) == n_domains
    for r in per_dom:
        assert r["n_at_or_over"] <= 1, (r["source"], r["n_at_or_over"])
        assert r["max_cum"] >= budget, (r["source"], r["max_cum"])
    # the crossing doc's pre-sum is under budget (operator filter), and
    # its cum is the realized size: bound the overshoot explicitly
    last = (
        mix.withColumn(
            "is_last",
            F.col("cum_tokens")
            == F.max("cum_tokens").over(Window.partitionBy("source")),
        )
        .filter("is_last")
        .select("source", "n_tokens", "cum_tokens")
        .collect()
    )
    for r in last:
        assert r["cum_tokens"] - r["n_tokens"] < budget <= r["cum_tokens"]
    print(
        f"[soak-mix] token_budget_mix: {t_mix:.1f}s, "
        f"kept {mix.count()} of {n_docs}; budget reached in all "
        f"{n_domains} domains, overshoot <= 1 doc everywhere"
    )

    # kept-set exactness for two domains vs python greedy
    for dom_idx in (0, 7):
        dom = f"dom{dom_idx}"
        got = {
            r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
            for r in mix.filter(F.col("source") == dom).collect()
        }
        ids = range(dom_idx, n_docs, n_domains)
        ordered = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        exp, cum = {}, 0
        for i in ordered:
            if cum >= budget:
                break
            n = 20 + (i * 7) % 50
            cum += n
            exp[i] = (n, cum)
        assert got == exp, (
            dom,
            len(got),
            len(exp),
            next(iter(set(got.items()) ^ set(exp.items())), None),
        )
        print(
            f"[soak-mix] {dom}: kept set EXACT vs python greedy "
            f"({len(exp)} docs, realized {cum} tokens)"
        )
    mix.unpersist()

    # ---- intra_doc_dedup ----
    lined = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws('\\n', "
            " md5(concat(id, '-1')), md5(concat(id, '-2')), "
            " CASE WHEN id % 2 = 0 THEN md5(concat(id, '-1')) "
            "      ELSE md5(concat(id, '-3')) END, "
            " md5(concat(id, '-4')), "
            " CASE WHEN id % 5 = 0 THEN md5(concat(id, '-2')) "
            "      ELSE md5(concat(id, '-5')) END)"
        ).alias("text"),
    ).repartition(64)
    t0 = time.time()
    out = intra_doc_dedup(lined)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_dropped").alias("dropped"),
    ).collect()[0]
    t_intra = time.time() - t0
    exp_dropped = sum(
        (1 if i % 2 == 0 else 0) + (1 if i % 5 == 0 else 0)
        for i in range(n_docs)
    )
    assert agg["n_rows"] == n_docs
    assert agg["dropped"] == exp_dropped, (agg["dropped"], exp_dropped)
    sample = out.filter(F.col("doc_id") % 997 == 0).collect()
    for r in sample:
        i = r["doc_id"]
        lines = [
            hashlib.md5(f"{i}-1".encode()).hexdigest(),
            hashlib.md5(f"{i}-2".encode()).hexdigest(),
            hashlib.md5(f"{i}-{1 if i % 2 == 0 else 3}".encode()).hexdigest(),
            hashlib.md5(f"{i}-4".encode()).hexdigest(),
            hashlib.md5(f"{i}-{2 if i % 5 == 0 else 5}".encode()).hexdigest(),
        ]
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert r["text_clean"] == "\n".join(kept), i
    print(
        f"[soak-mix] intra_doc_dedup: {t_intra:.1f}s, dropped "
        f"{agg['dropped']} == planted {exp_dropped} EXACT; "
        f"{len(sample)} sampled docs text-EXACT vs python reference"
    )

    # ---- unicode_clean ----
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.md5(F.col("id").cast("string")),
            F.md5(F.concat(F.col("id"), F.lit("x"))),
            F.md5(F.concat(F.col("id"), F.lit("y"))),
        ).alias("text"),
    ).repartition(64)
    dirty = base.select(
        "doc_id",
        F.col("text").alias("orig"),
        F.concat(
            F.lit("\ufeff"),
            F.replace(
                F.replace(F.col("text"), F.lit("e"), F.lit("e\u200b")),
                F.lit(" "),
                F.lit("\u00a0\u00a0"),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    cleaned = unicode_clean(dirty)
    mism = cleaned.filter(
        F.col("text_clean") != F.col("orig")
    ).count()
    t_uc = time.time() - t0
    assert mism == 0, mism
    # idempotence
    again = unicode_clean(
        cleaned.select("doc_id", F.col("text_clean").alias("text"))
    )
    mism2 = again.filter(F.col("text_clean") != F.col("text")).count()
    assert mism2 == 0, mism2
    print(
        f"[soak-mix] unicode_clean: {t_uc:.1f}s, clean(dirty) == "
        f"original for all {n_docs} docs; idempotent on all docs"
    )

    # ---- domain_upsample ----
    from ocr_spark.operators.textops import domain_upsample

    factors = {"dom0": 2.25, "dom1": 0.5, "dom2": 3.0}
    up_docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("dom"), (F.col("id") % 4)).alias("source"),
    ).repartition(64)
    t0 = time.time()
    ups = domain_upsample(up_docs, factors)
    per = (
        ups.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # per-doc epoch contiguity 0..n-1
    bad = (
        ups.groupBy("doc_id")
        .agg(F.max("epoch").alias("mx"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("mx") + 1 != F.col("n"))
        .count()
    )
    t_up = time.time() - t0
    assert bad == 0, bad
    got_n = {r["source"]: r["n"] for r in per}
    n_dom = n_docs // 4
    exp_frac = {"dom0": 2 + 0.25, "dom1": 0.5, "dom2": 3.0, "dom3": 1.0}
    for dom, f in exp_frac.items():
        frac = f - int(f)
        mean = int(f) * n_dom + frac * n_dom
        sd = (n_dom * frac * (1 - frac)) ** 0.5 if 0 < frac < 1 else 0.0
        lo, hi = mean - 6 * sd - 1, mean + 6 * sd + 1
        assert lo <= got_n.get(dom, 0) <= hi, (dom, got_n.get(dom), mean)
    # exact python-reference on a doc sample
    sample = ups.filter(F.col("doc_id") % 199 == 0).groupBy(
        "doc_id", "source"
    ).agg(F.count(F.lit(1)).alias("n")).collect()
    for r in sample:
        i, dom = r["doc_id"], r["source"]
        f = factors.get(dom, 1.0)
        thr = int((f - int(f)) * 65536)
        sel = int(
            hashlib.md5(f"{i}#up".encode()).hexdigest()[:4], 16
        )
        want = int(f) + (1 if sel < thr else 0)
        assert r["n"] == want, (i, dom, r["n"], want)
    print(
        f"[soak-mix] domain_upsample: {t_up:.1f}s, occurrence counts "
        f"within 6 sigma for all 4 domains; epochs contiguous for all "
        f"docs; {len(sample)} sampled docs EXACT vs python selector"
    )

    # ---- weighted_sample ----
    from ocr_spark.operators.textops import weighted_sample

    k = 10_000
    wdf = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (1.0 + (F.col("id") % 10)).alias("w"),
    ).repartition(64)
    t0 = time.time()
    got = weighted_sample(wdf, k=k, weight_col="w").collect()
    t_ws = time.time() - t0
    import math

    t1 = time.time()
    keys = []
    for i in range(n_docs):
        u = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) + 1
        ) / float(1 << 48)
        keys.append((math.log(u) / (1.0 + i % 10), -i))
    import heapq

    exp_top = heapq.nlargest(k, range(n_docs), key=lambda i: keys[i])
    t_ref = time.time() - t1
    got_sorted = [r["doc_id"] for r in sorted(got, key=lambda r: r["rk"])]
    assert got_sorted == exp_top, (
        len(set(got_sorted) ^ set(exp_top)),
        got_sorted[:3],
        exp_top[:3],
    )
    mean_w = sum(r["w"] for r in got) / k
    assert mean_w > 6.5, mean_w  # population mean is 5.5; race biases up
    print(
        f"[soak-mix] weighted_sample: {t_ws:.1f}s spark / {t_ref:.1f}s "
        f"python ref, top-{k} of {n_docs} EXACT (rank order equal); "
        f"sampled mean weight {mean_w:.2f} vs population 5.5"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
