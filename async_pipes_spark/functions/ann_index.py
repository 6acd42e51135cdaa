"""Persisted ANN index: IVFPQ built ONCE on the lake, served many.

The missing piece between the in-memory composed stack
(:func:`async_pipes_spark.functions.similarity.ivf_pq_topk`) and a
production deployment is that at 100 TB the index is STORAGE, not a
recomputation: the expensive pass (centroid training + the fused
cell+codes encode over the whole corpus) runs once per corpus commit,
and every retrieval request afterwards plans against the stored
artifacts. This module writes the three of them as tables —

- ``<path>/centroids``   — the coarse IVF centroids (tiny),
- ``<path>/codebooks``   — the PQ codebooks in long form
  ``(subspace, code, center)`` (a few KB),
- ``<path>/codes``       — the ``(vec_id, cell, codes)`` table,
  CLUSTERED BY CELL (range-partitioned + sorted, so each parquet file
  covers a narrow cell range) and committed through a manifest table
  with a footer-stats sidecar on ``cell``
  (:mod:`async_pipes_spark.sources.stats`),

— and serves queries by PLANNING the probe first: the union of the
query block's probed cells (the same deterministic
:func:`~async_pipes_spark.functions.similarity.probe_member_matrix`
every IVFPQ consumer shares) prunes the codes table to the files
whose [min, max] cell range intersects a probed cell
(``prune_files_in``), then the standard ADC scan + shortlist + exact
re-rank runs over the surviving files only. Cell-clustering makes
this the FAISS inverted-list read: an ``nprobe``-cell probe opens
~``nprobe/num_cells`` of the index files instead of all of them.
Pruning is conservative (a surviving file may hold extra cells — the
scan kernel's probe mask drops them), so stored-index results are
BIT-EQUAL to the in-memory operator on the same artifacts, which is
exactly what the parity test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from async_pipes_spark.functions.similarity import (
    _collect_block,
    ivf_pq_encode,
    ivf_pq_topk,
    kmeans_centroids,
    pq_codebooks,
    probe_member_matrix,
)
from async_pipes_spark.sources.sinks import (
    ConcurrentCommitError,
    _claim_commit,
    _manifest_lines,
    _manifest_read,
    _marker_path,
    _publish_pointer,
    merge_upsert,
    read_manifest_table,
    write_manifest_table,
)
from async_pipes_spark.sources.stats import prune_files_in, write_file_stats

#: the three sub-tables one index commit spans
_INDEX_TABLES = ("centroids", "codebooks", "codes")


def _index_pointer_read(spark, path: str) -> tuple[dict[str, str] | None, int]:
    """({table: pinned state} or None if no index pointer, commit seq)
    from the INDEX-ROOT pointer — the one commit object spanning the
    three sub-tables. The body is ALL ``#``-metadata lines
    (``#annindex`` + ``#table=name:state``), so generic manifest
    parsers see zero data versions at the index root and never mistake
    it for a manifest table."""
    lines = _manifest_lines(spark, path)
    if not lines or lines[0] != "#annindex":
        return None, 0
    pinned: dict[str, str] = {}
    seq = 0
    for ln in lines:
        if ln.startswith("#table="):
            name, _, state = ln[len("#table=") :].partition(":")
            pinned[name] = state
        elif ln.startswith("#seq="):
            try:
                seq = int(ln[len("#seq=") :])
            except ValueError:
                pass
    return pinned, seq


def _index_pointer_commit(
    spark, path: str, states: dict[str, str] | None = None
) -> dict[str, str]:
    """Publish one atomic index generation — a (centroids, codebooks,
    codes) state triple — through the same commit-log claim the
    manifest tables use (markers under ``<path>/_commits`` carry the
    full body; readers roll forward).

    ``states``: the triple the CALLER knows to be consistent (the
    states its own sub-table commits produced / its encode actually
    read). Pass it whenever available — re-reading live states here
    could pin a MIXED triple under a concurrent writer (new codebooks
    with old codes: the round-8 advisor finding). Omitted entries (or
    ``states=None``) fall back to the sub-table's live state — the
    single-writer/back-compat path. The atomicity guarantee is
    SINGLE-WRITER crash safety (a crash between sub-table commits and
    the root publish leaves readers on the previous complete index);
    concurrent REBUILD vs UPSERT writers each pin a self-consistent
    triple, last publish wins, and an aged-out pin self-repairs at
    read (:func:`_index_read_states`). Returns the pinned triple."""
    import time

    from async_pipes_spark.sources.sinks import _hadoop_fs, _raw_pointer_seq

    fs, _, jvm = _hadoop_fs(spark, f"{path}/{'_MANIFEST'}")
    for attempt in range(64):
        _, seq = _index_pointer_read(spark, path)
        pinned = {}
        for t in _INDEX_TABLES:
            if states and states.get(t):
                pinned[t] = states[t]
                continue
            live, _, _ = _manifest_read(spark, f"{path}/{t}")
            if not live:
                raise ValueError(
                    f"index sub-table missing: {path}/{t} — "
                    "write_ann_index() builds all three before the root commit"
                )
            pinned[t] = live[0]
        body = (
            "#annindex\n"
            + "".join(f"#table={t}:{pinned[t]}\n" for t in _INDEX_TABLES)
            + f"#seq={seq + 1}\n"
        )
        if _claim_commit(spark, path, seq + 1, body):
            if _raw_pointer_seq(spark, path) > seq:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(_marker_path(path, seq + 1)),
                    False,
                )
                raise ConcurrentCommitError(
                    f"{path}: stale index commit slot {seq + 1}"
                )
            _publish_pointer(spark, path, body, seq + 1)
            return pinned
        time.sleep(min(0.05 * (attempt + 1), 1.0))
    raise ConcurrentCommitError(
        f"{path}: could not claim an index commit slot after 64 attempts"
    )


def _index_read_states(spark, path: str) -> dict[str, str | None]:
    """The consistent sub-table states a reader should use: the root
    pointer's pinned triple when present (atomic — a crash between
    sub-table commits leaves this on the previous complete index), or
    live states for pre-pointer indexes (back-compat; such an index
    was built by a single writer or not at all).

    SELF-REPAIR is handled by :func:`_read_index_table`: a pinned
    state that aged out of its sub-table's retained window (a crash
    between a sub-table commit and the root publish, followed by
    enough later commits for GC to drop the pinned version) would make
    every read raise "not retained" on a healthy index — the read
    falls back to that sub-table's LIVE state (newer than the pin by
    construction: states only leave the window by being superseded).
    The repair is LAZY — no retention probe on the hot path; the
    common case pays zero extra pointer reads."""
    pinned, _ = _index_pointer_read(spark, path)
    if pinned is None:
        return {t: None for t in _INDEX_TABLES}
    missing = [t for t in _INDEX_TABLES if t not in pinned]
    if missing:
        raise ValueError(f"index pointer at {path} missing tables: {missing}")
    return pinned  # type: ignore[return-value]


def _read_index_table(spark, path: str, table: str, state: str | None):
    """Read one index sub-table at its pinned state, with the LAZY
    aged-pin self-repair (see :func:`_index_read_states`): "not
    retained" on a pin means GC outran a crashed root publish — fall
    back to the live state instead of bricking a healthy index."""
    try:
        return read_manifest_table(spark, f"{path}/{table}", version=state)
    except ValueError as e:
        if state is None or "not retained" not in str(e):
            raise
        return read_manifest_table(spark, f"{path}/{table}")


def write_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    num_centroids: int = 8,
    m: int = 16,
    codes_per_subspace: int = 64,
    iters: int = 5,
    num_files: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build + persist the IVFPQ index for ``corpus`` under ``path``.
    One corpus pass for the fused cell+codes encode (plus the bounded
    training samples for centroids/codebooks); the codes table commit
    is object-store-safe (manifest pointer) and cell-clustered so
    probes prune files. Returns ``{"files": N, "cells": K}``."""
    committed: dict[str, str] = {}

    def _live(t: str) -> str:
        return _manifest_read(spark, f"{path}/{t}")[0][0]

    n = corpus.count()  # one count shared by both training samplers
    cents = kmeans_centroids(
        corpus, k=num_centroids, iters=iters, id_col=id_col, vec_col=vec_col,
        n_rows=n,
    )
    books = pq_codebooks(
        corpus, m=m, k=codes_per_subspace, id_col=id_col, vec_col=vec_col,
        iters=iters, n_rows=n,
    )
    write_manifest_table(spark, cents, f"{path}/centroids")
    committed["centroids"] = _live("centroids")
    book_rows = [
        (j, c, list(map(float, center)))
        for j, book in enumerate(books)
        for c, center in enumerate(book)
    ]
    write_manifest_table(
        spark,
        spark.createDataFrame(
            book_rows, "subspace int, code int, center array<double>"
        ),
        f"{path}/codebooks",
    )
    committed["codebooks"] = _live("codebooks")
    # pin the encode output before the range shuffle: repartitionByRange
    # samples its child for range boundaries, so an unpinned encode would
    # run the full corpus kernel TWICE (sample pass + write pass). The
    # pinned table is the CODES (16-32× smaller than the corpus), so the
    # materialization is cheap relative to the corpus re-read it saves.
    from async_pipes_spark.session import pin

    encoded = pin(ivf_pq_encode(corpus, cents, books, id_col, vec_col))
    write_manifest_table(
        spark,
        encoded.repartitionByRange(num_files, "cell").sortWithinPartitions(
            "cell", "vec_id"
        ),
        f"{path}/codes",
    )
    n_files = write_file_stats(spark, f"{path}/codes", ["cell"])
    committed["codes"] = _live("codes")
    # ONE root commit publishes the (centroids, codebooks, codes)
    # triple atomically — a crash anywhere above leaves readers on the
    # previous complete index (or, for a first build, on a loudly
    # missing index), never on codes encoded against codebooks that
    # never published. The triple is the states THIS build committed
    # (not a live re-read, which a concurrent writer could mix)
    _index_pointer_commit(spark, path, committed)
    return {"files": n_files, "cells": num_centroids}


def ann_index_upsert(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    merge_on_read: bool = False,
) -> None:
    """Incrementally maintain a stored index — the FAISS ``add()``
    semantics at lake scale: encode ``vectors`` with the STORED
    centroids + codebooks (no retrain — new vectors quantize against
    the existing geometry, exactly as FAISS adds to trained inverted
    lists) and MERGE their codes into the codes table keyed on
    ``id_col``. New ids append; re-submitted ids re-encode and move to
    their new cell (the merge's key semantics make the move atomic —
    no stale code row survives in the old cell). The commit refreshes
    the footer-stats sidecar automatically and is safe under
    concurrent writers (the manifest commit log).

    The merged version is NOT re-clustered: upserted rows land in
    files whose cell range may be wide, so file pruning degrades
    gracefully (stats stay conservative-correct — a wide file simply
    stops being skippable) until :func:`ann_index_optimize` restores
    the clustered layout. This is precisely Delta/Iceberg's
    write-fast/OPTIMIZE-later contract, and the churn a retrieval
    corpus sees between optimizes is small relative to the base.

    ``merge_on_read=True`` switches the codes commit to
    :func:`~async_pipes_spark.sources.sinks.mor_upsert`: the write is
    O(batch) — one delta dir + pointer append — instead of the COW
    merge's full codes-table rewrite (at 100 TB index churn, THE
    maintenance cost). Serving stays PRUNED under the backlog: the
    stats sidecar keeps skipping the immutable BASE files on the
    untouched branch and the resolver unions the (small) resolved
    deltas — a probe opens only probed-cell base files + the backlog
    (:func:`ann_index_topk`); :func:`ann_index_optimize` folds the
    backlog back into a clustered base. Stick to one mode between
    optimizes (the COW merge refuses a backlogged table rather than
    dropping delta rows)."""
    from async_pipes_spark.session import pin
    from async_pipes_spark.sources.sinks import mor_upsert

    # the triple this encode READS is the consistency unit the root
    # re-publish must pin — re-reading live states at commit time could
    # mix a concurrent rebuild's codebooks with our codes
    states = _index_read_states(spark, path)
    cents, books = read_ann_index(spark, path)
    # the merge references its update set more than once (key probe,
    # anti-join, union) — pin the tiny codes batch so the encode kernel
    # runs exactly once over the incoming vectors
    encoded = pin(ivf_pq_encode(vectors, cents, books, id_col, vec_col))
    if merge_on_read:
        mor_upsert(spark, f"{path}/codes", encoded, [id_col])
    else:
        merge_upsert(spark, f"{path}/codes", encoded, [id_col])
    # republish the root triple at the merged codes state — readers
    # switch atomically from (old codes) to (new codes), never partway
    codes_live, _, _ = _manifest_read(spark, f"{path}/codes")
    _index_pointer_commit(
        spark, path,
        {
            "centroids": states["centroids"],
            "codebooks": states["codebooks"],
            "codes": codes_live[0] if codes_live else None,
        },
    )


def ann_index_optimize(
    spark: SparkSession,
    path: str,
    num_files: int = 8,
    occ_retries: int = 5,
) -> int:
    """Restore the codes table's cell clustering after a run of
    upserts (the index's OPTIMIZE): one range-partitioned, cell-sorted
    rewrite committed through the manifest at the sequence the table
    was read at — a concurrent :func:`ann_index_upsert` landing
    mid-rewrite wins and the optimize rebases instead of silently
    dropping it. Returns the committed file count."""
    from async_pipes_spark.sources.sinks import (
        _manifest_commit,
        _manifest_read,
    )

    codes_path = f"{path}/codes"
    states = _index_read_states(spark, path)
    versions, _, base_seq = _manifest_read(spark, codes_path)
    if not versions:
        raise ValueError(f"not a stored index codes table: {codes_path}")
    # resolved read: folds any merge-on-read backlog a run of
    # ann_index_upsert(merge_on_read=True) left — the committed version
    # is a plain clustered state again, reviving file pruning
    codes = read_manifest_table(spark, codes_path)
    clustered = codes.repartitionByRange(num_files, "cell").sortWithinPartitions(
        "cell", "vec_id"
    )
    try:
        _manifest_commit(spark, codes_path, clustered, expected_seq=base_seq)
    except ConcurrentCommitError:
        if occ_retries <= 0:
            raise
        return ann_index_optimize(spark, path, num_files, occ_retries - 1)
    codes_live, _, _ = _manifest_read(spark, codes_path)
    _index_pointer_commit(
        spark, path,
        {
            "centroids": states["centroids"],
            "codebooks": states["codebooks"],
            "codes": codes_live[0] if codes_live else None,
        },
    )
    # the commit already refreshed the stats sidecar; just report the
    # committed file count
    from async_pipes_spark.sources.sinks import _hadoop_fs, _resolve_table_path

    fs, live_p, _ = _hadoop_fs(spark, _resolve_table_path(spark, codes_path))
    return sum(
        1
        for st in fs.listStatus(live_p)
        if st.getPath().getName().startswith("part-")
        and st.getPath().getName().endswith(".parquet")
    )


def read_ann_index(spark: SparkSession, path: str):
    """(centroids DataFrame, codebooks list-of-lists) from a stored
    index — both tiny artifacts; the codes table stays on disk and is
    only file-pruned + scanned per query block. Reads the states the
    INDEX-ROOT pointer pins, so the pair is always from one atomic
    index commit."""
    states = _index_read_states(spark, path)
    cents = _read_index_table(spark, path, "centroids", states["centroids"])
    rows = _read_index_table(
        spark, path, "codebooks", states["codebooks"]
    ).collect()
    by_sub: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_sub.setdefault(r["subspace"], {})[r["code"]] = list(r["center"])
    books = [
        [by_sub[j][c] for c in sorted(by_sub[j])] for j in sorted(by_sub)
    ]
    return cents, books


def ann_index_topk(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    shortlist: int = 20,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a top-k retrieval from the STORED index at ``path``: plan
    the probe (union of the query block's probed cells → surviving
    codes files via the stats sidecar), scan only those files with the
    ADC kernel, exact-re-rank the shortlist against ``corpus`` (the
    raw-vector base table — the only thing the index does not store).
    Output schema and values match
    :func:`~async_pipes_spark.functions.similarity.ivf_pq_topk` run on
    the same stored artifacts bit-for-bit."""
    import numpy as np

    from async_pipes_spark.functions.vectors_np import seq_f32_self_dots

    cents, books = read_ann_index(spark, path)
    cent_rows = sorted(
        _collect_block(cents.select(id_col, vec_col), "centroid"),
        key=lambda r: r[0],
    )
    cent_ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    Cm = np.array([np.asarray(r[1], dtype=np.float32) for r in cent_rows])
    cn = np.sqrt(seq_f32_self_dots(Cm).astype(np.float64))
    q_rows = _collect_block(queries.select(id_col, vec_col), "query")
    if not q_rows:
        return spark.createDataFrame(
            [], "q_id bigint, rank bigint, c_id bigint, sim_micro bigint"
        )
    Qm = np.array([np.asarray(r[1], dtype=np.float32) for r in q_rows])
    qn = np.sqrt(seq_f32_self_dots(Qm).astype(np.float64))
    member = probe_member_matrix(Qm, qn, Cm, cn, nprobe)
    probed = sorted(int(c) for c in cent_ids[member.any(axis=0)])

    codes_path = f"{path}/codes"
    pinned = _index_read_states(spark, path)["codes"]
    codes_states, _, _ = _manifest_read(spark, codes_path)
    live = codes_states[0] if codes_states else None
    # file pruning plans against the LIVE state's sidecar — usable only
    # while the root pointer pins exactly that state (a concurrent
    # writer advancing codes between its merge and its root publish
    # opens a brief window; the pinned read stays consistent, just
    # unpruned)
    from async_pipes_spark.sources.sinks import _state_deltas

    deltas = _state_deltas(live) if live else []
    usable = pinned is None or pinned == live
    if deltas and usable:
        # merge-on-read backlog (ann_index_upsert(merge_on_read=True)):
        # the sidecar still prunes the immutable BASE to probed-cell
        # files; the resolver unions the resolved delta codes (keyed,
        # unversioned — contested keys never scan the base). Rows of
        # unprobed cells riding a surviving file or a delta are masked
        # by the ADC kernel exactly as in the compacted path.
        from async_pipes_spark.sources.stats import _mor_pruned_read

        plan = prune_files_in(
            spark, codes_path, "cell", probed, base_only=True
        )
        encoded = _mor_pruned_read(
            spark, codes_path, deltas, plan[0] if plan is not None else None
        )
    elif not usable:
        encoded = _read_index_table(spark, path, "codes", pinned)
    else:
        plan = prune_files_in(spark, codes_path, "cell", probed)
        if plan is None:  # sidecar missing/stale
            encoded = _read_index_table(spark, path, "codes", pinned)
        else:
            kept, _total = plan
            encoded = (
                spark.read.parquet(*kept)
                if kept
                else _read_index_table(
                    spark, path, "codes", pinned
                ).where(F.lit(False))
            )
    return ivf_pq_topk(
        corpus,
        queries,
        k,
        books,
        shortlist=shortlist,
        nprobe=nprobe,
        centroids=cents,
        encoded=encoded,
        id_col=id_col,
        vec_col=vec_col,
    )


def ann_index_probe_stats(
    spark: SparkSession, path: str, cells
) -> tuple[int, int]:
    """(BASE files a probe of ``cells`` opens, total base files) — the
    observability hook tests pin the skipping win with. Under a
    merge-on-read backlog the counts cover the base side of the plan
    (the resolved deltas are always read on top — they ARE the probe's
    unpruned tail until ann_index_optimize folds them)."""
    from async_pipes_spark.sources.sinks import mor_deltas

    codes_path = f"{path}/codes"
    plan = prune_files_in(
        spark, codes_path, "cell", list(cells),
        base_only=bool(mor_deltas(spark, codes_path)),
    )
    if plan is None:
        raise ValueError(f"no stats sidecar for {path}/codes")
    kept, total = plan
    return len(kept), total
