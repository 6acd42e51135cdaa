"""Distributed PageRank over an edge DataFrame — the iterative
join-aggregate graph primitive (the cycle/quiescence pattern of the
reference's cyclic pipes applied to a fixpoint computation, like
functions.dedup's connected components).

Determinism contract: ranks are INTEGER MICRO-UNITS and every step is
integer arithmetic (``DIV``), so any engine replays the identical
trajectory — float PageRank is combine-order-dependent (sums of
doubles) and can never hash-match an external oracle. The update is
the scaled (unnormalized) original form:

    rank_0(v)   = 1_000_000
    rank_{i+1}(v) = teleport_micro
                  + (damping_pct * Σ_{u→v} (rank_i(u) DIV outdeg(u))) DIV 100

Dangling mass (nodes with no out-edges) is dropped, the simplest of
the standard conventions — document-ranking uses (teleport 150000,
damping 85) ≙ the canonical 0.15/0.85.

Scale shape per iteration: one join of edges to ranks on the source
(edges carry their outdegree, precomputed once), one partial-agged sum
keyed by destination, one left join back to the node set. Hot
destinations (celebrity nodes) cost a counter in the map-side combine,
never a buffered list. Lineage is cut every round (localCheckpoint) so
plans stay flat across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_micro(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    teleport_micro: int = 150_000,
) -> DataFrame:
    """(node, rank_micro) after ``iterations`` exact integer rounds.
    Duplicate edges count once (the edge set is made distinct) —
    weighted graphs should pre-aggregate weights instead."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_t")
    ).distinct()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_t").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_d"))
    e = e.join(outdeg, "_s").localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1_000_000).cast("bigint").alias("rank_micro"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["_s"] == ranks["node"])
            .select(F.col("_t"), F.expr("rank_micro div _d").alias("_w"))
            .groupBy("_t")
            .agg(F.sum("_w").alias("_c"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["_t"], "left")
            .select(
                "node",
                (
                    F.lit(teleport_micro)
                    + F.expr(f"({damping_pct} * coalesce(_c, 0)) div 100")
                )
                .cast("bigint")
                .alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
