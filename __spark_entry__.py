"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline (the fused pandas-UDF
chain) at sf0.001; ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 with DuckDB-verifiable oracles (see
``ocr_spark.driver_contract`` for the implementations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (html route, boilerplate strip,
    3-candidate ensemble, spans, error channel) over sf0.001 documents
    reshaped as transcripts."""
    from ocr_spark.driver_contract import _docs_as_transcripts
    from ocr_spark.extract import extract

    t = _docs_as_transcripts(spark, "/root/testdata/sf0.001", "html")
    return extract(t, partitions=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.driver_contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_spark.driver_contract import ORACLES

    return dict(ORACLES)
