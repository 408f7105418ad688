"""Link-graph operators: PageRank over a (src, dst) edge relation.

The reference has no link-analysis stage; this family serves the
web-curation side of the pipeline (Common-Crawl-style host ranking as a
page-quality prior, cf. the harmonic-centrality ranking CC publishes).
Spark-first shape: the edge list is the big relation and is touched
once per power iteration through a node-keyed join + one aggregation;
ranks are a node-sized relation that localCheckpoints every iteration
(the connected_components precedent — truncate lineage instead of
growing a 3-iteration mega-plan).

Cross-engine fixed-point contract: every iteration's rank passes
through a float32 cast (never ``round(x, 6)`` — a decimal round can
tie-diverge between engines, the cast of a bit-identical double
cannot), and all arithmetic is explicit-DOUBLE on both engines (DuckDB
would otherwise evaluate FLOAT/BIGINT in float32 while Spark widens to
double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution.

    ``edges`` is a directed (src, dst) relation (multi-edges collapse
    via distinct; self-loops participate like any edge — both engines
    see the same graph, so the policy only has to be consistent).
    Returns (node, rank) after exactly ``iters`` power iterations,
    rank as float32.

    Update rule per iteration (classic Brin/Page with dangling mass):

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u)
                                  + dangling_mass / N)

    Scale notes:
    - The per-iteration big-relation work is edges JOIN ranks (ranks is
      node-sized — AQE broadcasts it when hosts << edges, the common
      web-graph regime) followed by ONE groupBy(dst) sum with map-side
      partials. Nothing corpus-sized ever sorts.
    - N and the iteration count are driver literals; each iteration's
      node-sized result localCheckpoints, deliberately cutting lineage
      (kmeans_assign precedent). ``checkpoint=False`` keeps the full
      lineage instead — ONLY for plan inspection/tests (the plan grows
      per iteration); production callers leave it on.
    - dangling mass is a 1-row aggregate crossJoined in (broadcast —
      Spark plans a 1-row BNLJ, never a real cartesian).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) — built once, reused every iteration
    linked = e.join(outdeg, "src").localCheckpoint(eager=True)
    # the dangling-node SET is iteration-invariant: derive it once
    # (its MASS changes per iteration and is re-aggregated below)
    dangling = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
        .localCheckpoint(eager=True)
    )

    base = F.lit(1.0 - damping) / F.lit(float(n))
    ranks = nodes.withColumn(
        "rank", (F.lit(1.0) / F.lit(float(n))).cast("float")
    ).localCheckpoint(eager=True)

    for _ in range(iters):
        contrib = (
            linked.join(ranks, linked["src"] == ranks["node"])
            .groupBy("dst")
            .agg(
                F.sum(
                    F.col("rank").cast("double")
                    / F.col("outdeg").cast("double")
                ).alias("contrib")
            )
        )
        dang = (
            ranks.join(dangling, "node", "left_semi")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("double")), F.lit(0.0)
                ).alias("dang")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                )
                .cast("float")
                .alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
