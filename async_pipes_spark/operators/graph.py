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

from async_pipes_spark.session import pin as _pin


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
        .transform(_pin)
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_d"))
    e = e.join(outdeg, "_s").transform(_pin)

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
            .transform(_pin)
        )
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph of
    ``edges`` (src, dst) — the clustering/cohesion primitive (spam
    farms and link rings light up as triangle-dense neighborhoods).

    Each triangle is enumerated exactly once in canonical a<b<c
    orientation: canonicalize + dedupe edges, self-join once for
    wedges (a<b<c via the two orderings), then a SEMI join closes
    them — no triangle row ever carries payload, and the explode back
    to per-node counts is 3 rows per triangle. Scale note: on skewed
    degree distributions, orient edges low-degree→high-degree instead
    of by id (the standard bound of wedge counts by sum of
    min-degrees); id-orientation keeps this demo deterministic and is
    fine at dimension-graph size. Isolated-from-triangles nodes are
    emitted with 0."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(_pin)
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
    )
    tris = wedges.join(
        e3,
        (F.col("a") == F.col("e3.u")) & (F.col("c") == F.col("e3.v")),
        "left_semi",
    )
    # node set from the RAW edge list: a node whose only edges are
    # self-loops would vanish from `und` (the u != v filter) and lose
    # its promised zero row entirely
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    per = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return nodes.join(per, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
