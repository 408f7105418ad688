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
  dominate): shows the family scales when work is CPU, sharpening the
  contrast with the string/scan-bound line_dedup below.
- line_dedup 2->8 (original collect_list-reassembly formulation):
  eff ~0.64 (0.526/0.639; a third rep was contaminated by a
  concurrent job and is discounted). Diagnosis runs: 1->4 = 0.95
  (165.8s -> 43.6s) while 4->8 was nearly flat — near-ideal scaling
  until the single socket's shared resources saturate between 4 and
  8 cores. That diagnosis motivated the fingerprints-only rewrite
  (only 32 B/line md5s shuffle; text_clean rebuilds IN-ROW from the
  original text): 1.35-1.45x faster at BOTH levels (2-core 57-60s vs
  77-107s, 8-core 21-22s vs 30-51s), eff 0.673 (0.673/0.673/0.692) —
  the saturation step remains (the op is still scan/string-bound) but
  at a much lower absolute cost and a fraction of the shuffle bytes.
  Same host physics BENCH/BASELINE.md documents for the extraction
  8->32 pair, arriving earlier for string-heavy ops; multi-node
  clusters add bandwidth per node, which is what the N->4N criterion
  models.

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
SEARCH_CACHE = Path("/tmp/ocr_spark_bench") / f"search_corpus_{N_DOCS}.parquet"
CURATE_CACHE = Path("/tmp/ocr_spark_bench") / f"curate_corpus_{N_DOCS}.parquet"
PAIRS = [(2, 8)]
REPS = 3


def _ensure_corpora():
    """Generate the soak corpora if absent (reuses the soak generators
    so the scaling input is byte-identical to the soak input)."""
    import importlib.util

    from pyspark.sql import SparkSession

    need = [
        (SEARCH_CACHE, "soak_search", "gen_partition",
         "doc_id long, text string, planted boolean, paired boolean"),
        (CURATE_CACHE, "soak_curate", "gen_partition",
         "doc_id long, text string, has_banner boolean"),
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
    for cache, mod, fn, schema in missing:
        spec = importlib.util.spec_from_file_location(
            mod, REPO / "BENCH" / f"{mod}.py"
        )
        m = importlib.util.module_from_spec(spec)
        saved = sys.argv
        sys.argv = [f"{mod}.py"]
        spec.loader.exec_module(m)
        sys.argv = saved
        (
            spark.range(N_DOCS)
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
    args = ap.parse_args()
    if args.level:
        return worker(args.level, args.op)

    _ensure_corpora()
    have_taskset = shutil.which("taskset") is not None
    results = {}
    for op in ("bm25", "line_dedup", "simhash"):
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
