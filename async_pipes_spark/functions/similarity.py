"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB design demands:

- **Brute force** (:func:`cosine_topk`): broadcast the bounded query
  set; the candidate corpus streams past it with no shuffle of the big
  side. Correct baseline + re-ranker. All JVM-side float folds.
- **IVF** (:func:`ivf_assign` / :func:`ivf_topk`): coarse quantization
  — assign every vector to its nearest centroid, search only the
  query's cell. At scale, centroids come from a sampled KMeans and the
  corpus is written bucketed by cell id so a probe touches one bucket;
  here centroids are a deterministic prefix of the corpus so the DuckDB
  oracle can replicate the exact assignment.

Determinism: similarity ordering and outputs use integer micro-units
(ties broken by id), so rankings are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from async_pipes_spark.functions.vectors import cosine_sim_f32, micro_units, norm_f32
from async_pipes_spark.operators.partitioning import fan_out


def _sides(emb: DataFrame, id_col: str, vec_col: str, prefix: str, parallel: bool = False) -> DataFrame:
    src = fan_out(emb) if parallel else emb
    return src.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}e"),
        norm_f32(vec_col).alias(f"{prefix}n"),
    )


def cosine_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, candidate) cosine similarities, Arrow-vectorized:
    (q_id, c_id, sim_micro), self-pairs excluded.

    The bounded query block is collected once and closed over by a
    ``mapInPandas`` kernel; the corpus scan stays distributed with no
    shuffle and no per-pair interpreted lambdas — each Arrow batch is
    one numpy all-pairs computation. Accumulation replicates the
    engine's sequential-float32 contract (vectors_np) so results are
    bit-identical to the JVM fold and the DuckDB oracle.
    """
    import numpy as np
    import pandas as pd

    from async_pipes_spark.functions.vectors_np import (
        micro_units_np,
        seq_f32_dots,
        seq_f32_self_dots,
    )

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qm = np.array([np.asarray(r[1], dtype=np.float32) for r in q_rows])
    qn = np.sqrt(seq_f32_self_dots(Qm).astype(np.float64))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float32, copy=False)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            cn = np.sqrt(seq_f32_self_dots(C).astype(np.float64))
            sim = seq_f32_dots(C, Qm).astype(np.float64) / (cn[:, None] * qn[None, :])
            micro = micro_units_np(sim)
            n, m = micro.shape
            out = pd.DataFrame(
                {
                    "q_id": np.tile(q_ids, n),
                    "c_id": np.repeat(c_ids, m),
                    "sim_micro": micro.ravel(),
                }
            )
            yield out[out.q_id != out.c_id]

    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, "q_id bigint, c_id bigint, sim_micro bigint"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus:
    (q_id, rank, c_id, sim_micro). Queries are broadcast (closed over
    by the Arrow kernel); only the tiny (id, id, sim) pair set is
    shuffled for the per-query ranking window."""
    sims = cosine_pairs(corpus, queries, id_col, vec_col)
    w = Window.partitionBy("q_id").orderBy(F.col("sim_micro").desc(), F.col("c_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("rank").cast("bigint").alias("rank"), "c_id", "sim_micro")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine:
    (vec_id, embedding, cell). Centroids are broadcast; one window per
    vector over #centroids candidates."""
    cents = centroids.select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("ce"),
        norm_f32(vec_col).alias("cn"),
    )
    vecs = _sides(corpus, id_col, vec_col, "v", parallel=True)
    w = Window.partitionBy("v_id").orderBy(F.col("_sim").desc(), F.col("cent_id"))
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "v_id",
            "ve",
            "cent_id",
            micro_units(cosine_sim_f32("ve", "ce", F.col("vn"), F.col("cn"))).alias("_sim"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("v_id").alias("vec_id"),
            F.col("ve").alias("embedding"),
            F.col("cent_id").alias("cell"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    num_centroids: int,
    queries_filter,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's IVF cell.

    Centroids = the ``num_centroids`` lowest-id vectors (deterministic;
    swap for KMeans centers in production). ``queries_filter`` is a
    Column predicate selecting query vectors."""
    centroids = corpus.filter(F.col(id_col) < num_centroids)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    cand = assigned.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("ce"),
        norm_f32("embedding").alias("cn"),
        "cell",
    )
    q = assigned.filter(queries_filter(F.col("vec_id"))).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        norm_f32("embedding").alias("qn"),
        "cell",
    )
    sims = (
        cand.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            micro_units(cosine_sim_f32("qe", "ce", F.col("qn"), F.col("cn"))).alias("sim_micro"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_micro").desc(), F.col("c_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("rank").cast("bigint").alias("rank"), "c_id", "sim_micro")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold_micro: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a similarity
    threshold (micro-units): (id_a, id_b, sim_micro).

    Written as cell-bucketed candidate generation (IVF cells) so only
    same-cell pairs are compared — the scalable analogue of
    all-pairs; near-dups land in the same cell with high probability."""
    centroids = corpus.filter(F.col(id_col) < 8)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ae"),
        norm_f32("embedding").alias("an"), "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("be"),
        norm_f32("embedding").alias("bn"), "cell",
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            micro_units(cosine_sim_f32("ae", "be", F.col("an"), F.col("bn"))).alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= threshold_micro)
    )
