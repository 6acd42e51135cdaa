"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB design demands:

- **Brute force** (:func:`cosine_topk`): the bounded query set is
  closed over by an Arrow-vectorized kernel; the candidate corpus
  streams past it with no shuffle of the big side. Correct baseline +
  re-ranker. Dot products are numpy batch math replicating the
  sequential-float32 contract bit-for-bit (vectors_np).
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
    (vec_id, embedding, cell). The centroid block (small by
    construction) is closed over by an Arrow kernel; the corpus scan
    stays distributed, one numpy batch per Arrow batch — no join, no
    per-pair interpreted folds. Ties go to the lowest centroid id
    (argmax-first over id-sorted centroids), matching the window
    ordering of the SQL formulation and the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    from async_pipes_spark.functions.vectors_np import (
        micro_units_np,
        seq_f32_dots,
        seq_f32_self_dots,
    )

    cent_rows = sorted(
        centroids.select(id_col, vec_col).collect(), key=lambda r: r[0]
    )
    cent_ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    Cm = np.array([np.asarray(r[1], dtype=np.float32) for r in cent_rows])
    cn = np.sqrt(seq_f32_self_dots(Cm).astype(np.float64))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float32, copy=False)
            vn = np.sqrt(seq_f32_self_dots(V).astype(np.float64))
            sim = seq_f32_dots(V, Cm).astype(np.float64) / (vn[:, None] * cn[None, :])
            best = micro_units_np(sim).argmax(axis=1)  # first max = lowest cent_id
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "embedding": pdf[vec_col],
                    "cell": cent_ids[best],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, "vec_id bigint, embedding array<float>, cell bigint"
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
    import numpy as np
    import pandas as pd

    from async_pipes_spark.functions.vectors_np import (
        micro_units_np,
        seq_f32_dots,
        seq_f32_self_dots,
    )

    centroids = corpus.filter(F.col(id_col) < num_centroids)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    marked = assigned.withColumn("_is_q", queries_filter(F.col("vec_id")))

    def cell_sims(pdf: pd.DataFrame) -> pd.DataFrame:
        isq = pdf["_is_q"].to_numpy(dtype=bool)
        if not isq.any():
            return pd.DataFrame(
                {
                    "q_id": np.empty(0, np.int64),
                    "c_id": np.empty(0, np.int64),
                    "sim_micro": np.empty(0, np.int64),
                }
            )
        V = np.stack(pdf["embedding"].to_numpy()).astype(np.float32, copy=False)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        nrm = np.sqrt(seq_f32_self_dots(V).astype(np.float64))
        sim = seq_f32_dots(V[isq], V).astype(np.float64) / (
            nrm[isq, None] * nrm[None, :]
        )
        micro = micro_units_np(sim)
        m, n = micro.shape
        out = pd.DataFrame(
            {
                "q_id": np.repeat(ids[isq], n),
                "c_id": np.tile(ids, m),
                "sim_micro": micro.ravel(),
            }
        )
        return out[out.q_id != out.c_id]

    sims = marked.groupBy("cell").applyInPandas(
        cell_sims, "q_id bigint, c_id bigint, sim_micro bigint"
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
    import numpy as np
    import pandas as pd

    from async_pipes_spark.functions.vectors_np import (
        micro_units_np,
        seq_f32_dots,
        seq_f32_self_dots,
    )

    centroids = corpus.filter(F.col(id_col) < 8)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        V = np.stack(pdf["embedding"].to_numpy()).astype(np.float32, copy=False)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        nrm = np.sqrt(seq_f32_self_dots(V).astype(np.float64))
        micro = micro_units_np(
            seq_f32_dots(V, V).astype(np.float64) / (nrm[:, None] * nrm[None, :])
        )
        iu, ju = np.triu_indices(len(ids), k=1)  # ids sorted → id_a < id_b
        keep = micro[iu, ju] >= threshold_micro
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "sim_micro": micro[iu[keep], ju[keep]],
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        cell_pairs, "id_a bigint, id_b bigint, sim_micro bigint"
    )
