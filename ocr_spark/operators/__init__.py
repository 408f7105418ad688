"""DataFrame-level operators.

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage codegen) — no Python UDFs. Each operator has a
matching ANSI-SQL oracle in ``ocr_spark.driver_contract`` so the driver
can verify it against DuckDB value-for-value.
"""
