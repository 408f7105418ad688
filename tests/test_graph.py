"""PageRank: golden-reference equality, dangling mass, policies."""

from __future__ import annotations

import pytest

from ocr_spark.kernels.graph_ref import ref_pagerank as _ref_pagerank
from ocr_spark.operators.graph import pagerank

EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 3),
    (4, 1), (4, 5),          # 5 has no out-edges -> dangling
    (2, 3),                  # duplicate edge: collapses via distinct
    (6, 6),                  # self-loop participates like any edge
    (3, 6),
]


def _run(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    return {
        r["node"]: r["rank"] for r in pagerank(df, **kw).collect()
    }


def test_pagerank_matches_reference(spark):
    got = _run(spark, EDGES)
    ref = _ref_pagerank(EDGES)
    assert set(got) == set(ref)
    for v in ref:
        # agg order may differ between engines pre-quantization; the
        # float32 grid makes anything beyond ~1e-6 a real divergence
        assert abs(got[v] - float(ref[v])) < 1e-6, v


def test_pagerank_mass_conserved_and_positive(spark):
    got = _run(spark, EDGES)
    assert abs(sum(got.values()) - 1.0) < 1e-5
    assert all(r > 0 for r in got.values())


def test_pagerank_dangling_node_gets_teleport_plus_dangling_share(spark):
    # node 5 has no in-links besides nothing and no out-edges: its rank
    # is exactly base + d * (contrib_from_4 + dang/N) — reference pins
    # it; a missing dangling branch would leak its mass (sum < 1)
    got = _run(spark, EDGES)
    ref = _ref_pagerank(EDGES)
    assert abs(got[5] - float(ref[5])) < 1e-6


def test_pagerank_multi_edge_collapses(spark):
    base = _run(spark, [(1, 2), (2, 1)])
    dup = _run(spark, [(1, 2), (1, 2), (2, 1)])
    assert base == dup


def test_pagerank_iters_validated(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


def test_pagerank_sink_heavy_graph_ranks_hub_highest(spark):
    # star graph: everyone points at 0
    star = [(i, 0) for i in range(1, 8)]
    got = _run(spark, star)
    assert max(got, key=got.get) == 0


def test_link_curation_gate_semantics(spark):
    """Composition: every surviving doc's host must be in the
    independently-computed top-25% host set, every doc on such a host
    survives, and host_rank round-trips the pagerank value."""
    import math

    from pyspark.sql import functions as F

    from ocr_spark.driver_contract import q_link_curation, q_pagerank

    sf = "/root/testdata/sf0.001"
    ranks = {
        r["node"]: r["rank"] for r in q_pagerank(spark, sf).collect()
    }
    cut = math.ceil(0.25 * len(ranks))
    top = {
        n for n, _ in sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[
            :cut
        ]
    }
    kept = q_link_curation(spark, sf).collect()
    assert kept, "composition returned nothing"
    # every top-ranked host in 0..31 has docs at this sf, so the kept
    # host set must be exactly the doc-host slice of the top set
    assert {r["host"] for r in kept} == {h for h in top if h < 32}
    for r in kept:
        assert r["host"] in top
        assert abs(r["host_rank"] - ranks[r["host"]]) == 0.0
    # completeness: count docs per surviving host against the corpus
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    per_host = {
        r["host"]: r["n"]
        for r in docs.select((F.col("doc_id") % 32).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_per_host: dict = {}
    for r in kept:
        got_per_host[r["host"]] = got_per_host.get(r["host"], 0) + 1
    for h, n in got_per_host.items():
        assert n == per_host[h], (h, n, per_host[h])


def test_pagerank_randomized_equivalence_vs_golden(spark):
    """Seeded random graphs (the substring_dedup randomized-equivalence
    precedent): dangling nodes, self-loops, multi-edges and disconnected
    pieces all arise naturally; every node must match the golden within
    the float32 envelope."""
    import random

    for seed in range(12):
        rng = random.Random(f"pr#{seed}")
        n_nodes = rng.randint(2, 9)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(1, 14))
        ]
        got = _run(spark, edges, iters=2)
        ref = _ref_pagerank(edges, iters=2)
        assert set(got) == set(ref), seed
        for v in ref:
            assert abs(got[v] - float(ref[v])) < 1e-6, (seed, v)


def test_pagerank_plan_shape(spark):
    """Scale-shape pins on the ADAPTIVE executed plan (checkpoint=False
    exposes the iteration; the production checkpoint hides it behind an
    RDD scan; ReusedExchange lesson — inspect AFTER collect()): the
    1-row dangling-mass crossJoin must be a broadcast nested-loop
    (never CartesianProduct), and the edge-relation joins
    (linked x ranks, nodes x contrib) must broadcast their node-sized
    sides — the edge relation itself never sorts. The remaining
    node-vs-dangling semi-join may stay sort-merge: both sides are
    node-sized, acceptable at web-graph scale."""
    df = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 9) for i in range(40)], ["src", "dst"]
    )
    out = pagerank(df, iters=1, checkpoint=False)
    out.collect()
    tree = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" in tree  # the 1-row dang join
    assert tree.count("BroadcastHashJoin") >= 2


# ---------------------------------------------------------------- HITS


def _run_hits(spark, edge_list, **kw):
    from ocr_spark.operators.graph import hits

    df = spark.createDataFrame(edge_list, ["src", "dst"])
    return {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, **kw).collect()
    }


def test_hits_matches_reference(spark):
    from ocr_spark.kernels.graph_ref import ref_hits

    got = _run_hits(spark, EDGES)
    ref = ref_hits(EDGES)
    assert set(got) == set(ref)
    for v, (h, a) in ref.items():
        assert abs(got[v][0] - float(h)) < 1e-6, ("hub", v)
        assert abs(got[v][1] - float(a)) < 1e-6, ("auth", v)


def test_hits_l1_norms_and_pure_roles(spark):
    # dst-only node = pure authority (hub 0); src-only = pure hub
    got = _run_hits(spark, [(1, 2), (1, 3), (4, 3)])
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-5
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-5
    assert got[2][0] == 0.0 and got[3][0] == 0.0  # dst-only: no hub
    assert got[1][1] == 0.0 and got[4][1] == 0.0  # src-only: no auth
    # 3 has two in-edges, 2 one -> 3 is the stronger authority
    assert got[3][1] > got[2][1]


def test_hits_multi_edge_collapses_and_iters_validated(spark):
    from ocr_spark.operators.graph import hits

    base = _run_hits(spark, [(1, 2), (2, 1)])
    dup = _run_hits(spark, [(1, 2), (1, 2), (2, 1)])
    assert base == dup
    with pytest.raises(ValueError):
        hits(spark.createDataFrame([(1, 2)], ["src", "dst"]), iters=0)


def test_hits_randomized_equivalence_vs_golden(spark):
    from ocr_spark.kernels.graph_ref import ref_hits

    import random

    for seed in range(8):
        rng = random.Random(f"hits#{seed}")
        n_nodes = rng.randint(2, 9)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(1, 14))
        ]
        got = _run_hits(spark, edges, iters=2)
        ref = ref_hits(edges, iters=2)
        assert set(got) == set(ref), seed
        for v, (h, a) in ref.items():
            assert abs(got[v][0] - float(h)) < 1e-6, (seed, "hub", v)
            assert abs(got[v][1] - float(a)) < 1e-6, (seed, "auth", v)


def test_hits_plan_shape(spark):
    """checkpoint=False exposes the iteration (pagerank precedent):
    no CartesianProduct anywhere — the two 1-row L1-norm crossJoins
    per iteration must plan as broadcast nested-loops, and the
    edge-relation joins broadcast their node-sized sides."""
    from ocr_spark.operators.graph import hits

    df = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 9) for i in range(40)], ["src", "dst"]
    )
    out = hits(df, iters=1, checkpoint=False)
    out.collect()
    tree = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" in tree
