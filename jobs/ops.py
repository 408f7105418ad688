"""spark-submit entry point for the operator library.

Runs any registered query from ``ocr_spark.driver_contract`` against a
directory of parquet tables and writes the result as parquet:

    spark-submit --py-files dist/ocr_spark.zip jobs/ops.py \
        --query minhash_lsh --tables /root/testdata/sf0.1 \
        --output /tmp/out [--list]

Together with jobs/extract.py this makes every SURVEY.md §2 operator
reachable from the command line (the reference's upload.bat/download.bat
headless surface, /root/reference/README.md:51-56, generalized).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="ocr_spark operator runner")
    ap.add_argument("--query", help="query name (see --list)")
    ap.add_argument("--tables", help="dir containing <table>.parquet files")
    ap.add_argument("--output", help="output parquet dir")
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of writing "
        "(--output not required) — the shape review an operator gets "
        "before it ships: look for PushedFilters/ReadSchema at the "
        "scan, WholeStageCodegen spans, broadcast vs shuffle joins",
    )
    args = ap.parse_args(argv)

    from ocr_spark.driver_contract import QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if not (args.query and args.tables and (args.output or args.explain)):
        print(
            "--query, --tables and --output (or --explain) are required",
            file=sys.stderr,
        )
        return 2
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; try --list", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"ocr_spark-ops-{args.query}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    df = QUERIES[args.query](spark, args.tables)
    if args.explain:
        df.explain("formatted")
        spark.stop()
        return 0
    df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"{args.query}: wrote {n} rows -> {args.output}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
