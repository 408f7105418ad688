"""Pure pandas/numpy extraction kernels — Spark-free by design.

These modules are imported BOTH by the golden oracle used in tests and by
the fused pandas UDF in ``ocr_spark.extract``; the pytest suite therefore
proves that the Spark orchestration (partitioning, salting, ordering,
resume) preserves per-turn equality — exactly the north-rule invariant.
"""

from ocr_spark.kernels.pipeline import extract_batch, extract_one

__all__ = ["extract_batch", "extract_one"]
