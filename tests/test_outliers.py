"""embedding_outliers: reference equality, cut semantics, plan shape."""

from __future__ import annotations

import math
import random
import re

from decimal import ROUND_HALF_UP, Decimal

from ocr_spark.operators.clustering import embedding_outliers

D = 4


def _r(x: float, nd: int) -> float:
    """HALF_UP decimal round — Spark's round(), NOT Python's banker's
    round() (CLAUDE.md: tie behavior differs; the repo's references
    round HALF_UP, cf. soak_cluster)."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _fixture(n_per_label=12, labels=(0, 1), seed=11):
    rng = random.Random(seed)
    rows = []
    vid = 0
    for lab in labels:
        base = [float(lab + 1)] * D
        for _ in range(n_per_label):
            vec = [b + rng.uniform(-0.8, 0.8) for b in base]
            rows.append((vid, lab, [float(v) for v in vec]))
            vid += 1
    return rows


def _ref_flags(rows, frac):
    by_label: dict = {}
    for vid, lab, vec in rows:
        by_label.setdefault(lab, []).append((vid, vec))
    flags = {}
    for lab, members in by_label.items():
        cent = [
            _r(sum(v[i] for _, v in members) / len(members), 6)
            for i in range(D)
        ]
        cn = math.sqrt(sum(c * c for c in cent))
        scored = []
        for vid, vec in members:
            nv = math.sqrt(sum(x * x for x in vec))
            cos = _r(
                sum(x * c for x, c in zip(vec, cent)) / (nv * cn), 4
            )
            scored.append((cos, vid))
        scored.sort()
        cut = math.ceil(frac * len(members))
        out = {vid for _, vid in scored[:cut]}
        for vid, _ in members:
            flags[vid] = vid in out
    return flags


def _run(spark, rows, frac):
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    return embedding_outliers(df, frac=frac, vec_dims=D).collect()


def test_outliers_match_reference(spark):
    rows = _fixture()
    got = {r["vec_id"]: r["is_outlier"] for r in _run(spark, rows, 0.25)}
    assert got == _ref_flags(rows, 0.25)


def test_outliers_all_rows_kept_and_cut_exact(spark):
    rows = _fixture(n_per_label=10)
    res = _run(spark, rows, 0.3)
    assert len(res) == len(rows)
    per_label = {0: 0, 1: 0}
    for r in res:
        per_label[r["label"]] += int(r["is_outlier"])
    assert per_label == {0: 3, 1: 3}  # ceil(0.3 * 10)


def test_outliers_frac_one_flags_everything(spark):
    rows = _fixture(n_per_label=5)
    res = _run(spark, rows, 1.0)
    assert all(r["is_outlier"] for r in res)


def test_outliers_fine_window_is_level_partitioned(spark):
    """The exact-rank window must partition by (label, cos4) — the
    count-table design; a label-only row_number would sort each whole
    label in one task (parallelism capped at the label count)."""
    rows = _fixture()
    df = embedding_outliers(
        spark.createDataFrame(rows, ["vec_id", "label", "embedding"]),
        frac=0.25,
        vec_dims=D,
    )
    tree = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", tree)
    corpus = [s for s in specs if "vec_id" in s]  # vec_id tie-break
    assert corpus, "no corpus-row window found"
    for s in corpus:
        assert "cos4" in s, s
