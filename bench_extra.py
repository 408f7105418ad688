#!/usr/bin/env python
"""Per-query isolation harness for the r06 OPTIMIZATION round.

NOT the driver bench (bench.py is frozen): this tool times a SUBSET of
declared queries with the identical methodology (noop sink, min-of-N,
same SparkSession config as bench.py) so individual optimizations can
be measured without paying for the whole 120-query draw, and dumps
``explain("formatted")`` plans to ``plans/r06/``.

Usage::

    python bench_extra.py --sf-dir /root/testdata/sf1.0 KEY [KEY ...]
    python bench_extra.py --explain plans/r06 --suffix before KEY ...

Numbers printed here are cited in OPTIMIZATION_r06.md; the official
round numbers come from the frozen bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from bench import build_spark, _noop, timed  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"),
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--explain",
        default=None,
        metavar="DIR",
        help="also write <DIR>/<key>_<suffix>.txt explain('formatted')",
    )
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--no-time", action="store_true", help="explain only, skip timing"
    )
    args = ap.parse_args(argv)

    spark = build_spark(args.cpus, "ocr_spark-bench-extra")
    from ocr_spark import driver_contract as dc

    out: dict[str, float] = {}
    try:
        for key in args.keys:
            fn = dc.QUERIES[key]
            if args.explain:
                d = Path(args.explain)
                d.mkdir(parents=True, exist_ok=True)
                df = fn(spark, args.sf_dir)
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                txt = df._jdf.queryExecution().explainString(mode)
                (d / f"{key}_{args.suffix}.txt").write_text(txt)
                print(f"[extra] wrote {d / f'{key}_{args.suffix}.txt'}")
            if args.no_time:
                continue
            spark.sparkContext.setJobDescription(f"bench_extra:{key}")
            runs = [
                timed(lambda: _noop(fn(spark, args.sf_dir)))
                for _ in range(args.repeats)
            ]
            out[key] = min(runs)
            print(f"[extra] {key}: {runs} -> {out[key]}s", file=sys.stderr)
        print(json.dumps({"sf_dir": args.sf_dir, "queries": out}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
