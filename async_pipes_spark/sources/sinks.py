"""File sinks — the terminal side of ``with_consumer`` for persistent
outputs (the reference's consumers are side-effecting closures,
reference src/pipeline/builder.rs:169-183; here they become
``df.write`` with scale-aware layout controls).

Layout knobs that matter at 100 TB:

- ``partition_by``: directory partitioning on low-cardinality keys →
  downstream partition pruning.
- ``bucket_by``: pre-shuffled, co-located layout on a join/agg key —
  downstream joins on that key skip their shuffle entirely (requires
  ``saveAsTable``).
- ``target_file_rows``: coalesce/repartition so output files land near
  a target size instead of one-file-per-task dust.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    repartition: int | None = None,
) -> None:
    """Write a DataFrame to files (parquet/csv/json/orc)."""
    if repartition:
        df = df.repartition(repartition, *(partition_by or []))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table: joins
    and aggregations on ``bucket_cols`` against other tables bucketed
    the same way run shuffle-free."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _swap_directories(target_path: str, staging: str) -> None:
    """Publish ``staging`` as ``target_path`` (copy-on-write commit for
    a LOCAL filesystem). POSIX cannot atomically replace a non-empty
    directory, so this is two renames with a microsecond window between
    them; the long-running part (the write) never touches the target,
    and staging/backup are cleaned up whether or not the swap runs.
    On object stores (S3/HDFS) directory rename is copy-or-unsupported,
    so non-local URIs are REJECTED here — unpartitioned tables on an
    object store must be manifest tables (:func:`write_manifest_table`:
    immutable versioned data dirs + a single-object pointer commit), or
    use the partitioned dynamic-overwrite path of :func:`merge_upsert`
    (Spark's commit protocol handles staging there)."""
    import os
    import shutil
    import uuid

    scheme = target_path.split("://", 1)[0] if "://" in target_path else ""
    if scheme and scheme != "file":
        raise ValueError(
            f"directory-swap commit requires a local filesystem, got "
            f"{scheme}:// — create the table with write_manifest_table() "
            "(pointer-file commit, object-store-safe) or partition it "
            "(dynamic-overwrite commit)"
        )
    target_path = target_path.removeprefix("file://")
    staging = staging.removeprefix("file://")
    backup = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, backup)
    try:
        os.rename(staging, target_path)
    except BaseException:
        # roll the target back so a failed swap never loses the dataset
        os.rename(backup, target_path)
        raise
    shutil.rmtree(backup)


#: pointer file naming the live data version of a manifest table
_MANIFEST = "_MANIFEST"


def _hadoop_fs(spark, path_str: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _manifest_lines(spark, path: str) -> list[str]:
    """The pointer file's lines: [live_version] or [live, previous].
    Empty list if ``path`` is not a manifest table."""
    fs, p, jvm = _hadoop_fs(spark, f"{path}/{_MANIFEST}")
    if not fs.exists(p):
        return []
    # read through the Hadoop stream: Spark's own readers skip
    # underscore-prefixed files (which is exactly why the pointer and
    # the _data dir are underscore-named — a plain read of the table
    # root never sees them)
    stream = fs.open(p)
    try:
        content = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return [ln.strip() for ln in content.splitlines() if ln.strip()]


def manifest_version(spark, path: str) -> str | None:
    """The live data version of a manifest table, or None if ``path``
    is not one (no ``_MANIFEST`` pointer present)."""
    lines = _manifest_lines(spark, path)
    return lines[0] if lines else None


def _resolve_table_path(spark, path: str) -> str:
    """Data directory to READ for a table path: the live version dir of
    a manifest table, or the path itself for a plain parquet dir."""
    v = manifest_version(spark, path)
    return f"{path}/_data/{v}" if v else path


def _manifest_commit(spark, path: str, df: DataFrame) -> None:
    """Commit ``df`` as the new live version of a manifest table.

    Object-store-safe copy-on-write: the data lands in a fresh
    IMMUTABLE ``_data/v_<uuid>`` directory (never touching live data —
    a failure mid-write leaves an orphan dir, not a broken table), then
    a tiny pointer file is replaced. On a real object store the pointer
    PUT is atomic; on HDFS the tmp-write + rename is atomic; on the
    tiny delete→rename window of other filesystems a crash leaves the
    pointer MISSING — visible and recoverable (repoint at the newest
    version dir), never silent data loss, because version dirs are
    immutable. Versions older than the previous one are garbage-
    collected AFTER the commit, so in-flight readers that resolved the
    prior version finish against intact files."""
    import uuid

    version = f"v_{uuid.uuid4().hex[:12]}"
    df.write.mode("error").parquet(f"{path}/_data/{version}")
    prev = manifest_version(spark, path)
    fs, man_p, jvm = _hadoop_fs(spark, f"{path}/{_MANIFEST}")
    tmp_p = jvm.org.apache.hadoop.fs.Path(
        f"{path}/{_MANIFEST}.tmp.{uuid.uuid4().hex[:8]}"
    )
    # line 2 records the PREVIOUS committed version: time travel must
    # distinguish the legitimate predecessor from an orphan dir a
    # crashed commit left behind (both survive GC until next commit,
    # and a partially-written orphan would read as silent data loss)
    body = f"{version}\n{prev}\n" if prev else f"{version}\n"
    out = fs.create(tmp_p, True)
    try:
        out.write(bytearray(body.encode()))
    finally:
        out.close()
    fs.delete(man_p, False)
    if not fs.rename(tmp_p, man_p):
        raise OSError(f"manifest pointer rename failed for {path}")
    # GC: keep the new live version and its predecessor (one full
    # commit cycle of grace for concurrent readers); drop older ones
    keep = {version, prev} - {None}
    data_p = jvm.org.apache.hadoop.fs.Path(f"{path}/_data")
    for st in fs.listStatus(data_p):
        name = st.getPath().getName()
        if name not in keep:
            fs.delete(st.getPath(), True)


def write_manifest_table(spark, df: DataFrame, path: str) -> None:
    """Create (or fully rewrite) an UNPARTITIONED manifest table: data
    lives in immutable ``_data/v_*`` dirs, a ``_MANIFEST`` pointer file
    names the live one, and every commit is a single-object pointer
    replace — the object-store-safe alternative to the local-FS
    directory swap. :func:`merge_upsert`, :func:`purge_tombstones` and
    :func:`compact_small_files` detect the pointer automatically and
    commit through it; read the table via :func:`read_manifest_table`
    (plain ``spark.read.parquet`` on the root would see every
    version)."""
    _manifest_commit(spark, path, df)


def manifest_versions(spark, path: str) -> list[str]:
    """The COMMITTED versions of a manifest table, live first:
    [live] or [live, previous], straight from the pointer file. An
    orphan ``_data`` dir left by a crashed commit is deliberately NOT
    listed — it may be partially written, and reading it would be
    silent data loss; only versions a pointer replace actually
    published are time-travelable."""
    lines = _manifest_lines(spark, path)
    if not lines:
        raise ValueError(f"not a manifest table (no {_MANIFEST}): {path}")
    return lines


def read_manifest_table(spark, path: str, version: str | None = None) -> DataFrame:
    """Read a manifest table (mergeSchema, matching the engine's CDC
    read discipline): the live version by default, or — TIME TRAVEL
    over the retained window — any version still listed by
    :func:`manifest_versions` (GC keeps live + previous, so 'the table
    as of the last commit' stays readable until the next one)."""
    if version is None:
        version = manifest_version(spark, path)
        if version is None:
            raise ValueError(f"not a manifest table (no {_MANIFEST}): {path}")
    else:
        retained = manifest_versions(spark, path)
        if version not in retained:
            raise ValueError(
                f"version {version!r} not retained (have {retained}); "
                "manifest GC keeps the live and previous versions only"
            )
    return spark.read.option("mergeSchema", "true").parquet(
        f"{path}/_data/{version}"
    )


_PART_SAFE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-")


def _partition_subdir(partition_by, row) -> str:
    """`col=value/...` subdir for one partition tuple, Spark's naming:
    NULL and EMPTY STRING → __HIVE_DEFAULT_PARTITION__ (Spark writes
    both there); booleans → lowercase true/false (str(True) is 'True'
    — deleting 'p=True' would silently no-op and leave the stale
    duplicate this cleanup exists to remove); other values needing
    Spark's path-escaping (chars outside [A-Za-z0-9._-]) are rejected
    rather than guessed at."""
    parts = []
    for c in partition_by:
        v = row[c]
        if v is None or v == "":
            s = "__HIVE_DEFAULT_PARTITION__"
        elif isinstance(v, bool):
            s = "true" if v else "false"
        else:
            s = str(v)
            if not set(s) <= _PART_SAFE:
                raise ValueError(
                    f"partition value {s!r} needs path escaping; emptied-"
                    "partition cleanup supports plain alphanumeric values"
                )
        parts.append(f"{c}={s}")
    return "/".join(parts)


def _prune_to_partitions(df, rows, partition_by) -> DataFrame:
    """Restrict ``df`` to the partitions named by collected ``rows`` —
    the ONE definition of partition pruning shared by merge_upsert and
    purge_tombstones (so the NULL handling and the 64 threshold can
    never diverge). Up to 64 partitions: a null-safe literal OR-chain
    (``isin()`` would evaluate NULL for a NULL partition value and
    silently drop that partition's rows), statically pruning the scan.
    Beyond: the driver-built expression tree is linear in partition
    count, so it switches to a broadcast null-safe semi join (O(1)
    plan size; dynamic pruning where available)."""
    from functools import reduce

    if len(rows) <= 64:
        pred = reduce(
            Column.__or__,
            [
                reduce(
                    Column.__and__,
                    [F.col(c).eqNullSafe(F.lit(r[c])) for c in partition_by],
                )
                for r in rows
            ],
        )
        return df.filter(pred)
    pk = df.sparkSession.createDataFrame(
        [tuple(r[c] for c in partition_by) for r in rows],
        df.select(*partition_by).schema,
    ).toDF(*[f"_pk_{c}" for c in partition_by])
    cond = reduce(
        Column.__and__,
        [F.col(c).eqNullSafe(F.col(f"_pk_{c}")) for c in partition_by],
    )
    return df.join(F.broadcast(pk), cond, "left_semi")


def _delete_partition_dir(spark, target_path: str, partition_by, row) -> None:
    """Remove one partition directory through the Hadoop FileSystem —
    the same API Spark's own commit protocol uses, so it works on
    file:// and object stores alike."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{target_path}/{_partition_subdir(partition_by, row)}"
    )
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_by: Sequence[str] | None = None,
    keys_partition_stable: bool = False,
    version_cols: Sequence[str] | None = None,
    tombstone_col: str | None = None,
    retain_tombstones: bool = True,
    allow_schema_evolution: bool = False,
) -> None:
    """Keyed upsert into a parquet directory (MERGE semantics without a
    table format): rows in ``updates`` replace target rows with the
    same key; unmatched target rows survive; new keys append.

    ``tombstone_col`` (requires ``version_cols``) completes the CDC
    triad with DELETES: an update row whose tombstone flag is true
    deletes the matching key — but only if it WINS the version
    resolution, so a late tombstone cannot erase data newer than it,
    and a tombstone older than a racing upsert loses symmetrically
    (the delete participates in exactly the same last-writer-wins
    window as any other change). NULL flags count as live.

    With ``retain_tombstones=True`` (the default) a winning delete is
    stored as a SOFT tombstone row — the flag becomes a real column of
    the table and readers filter it with ``coalesce(flag, false)``:
    stored NULL ≡ live, because a partitioned table's UNTOUCHED
    partitions keep their pre-tombstone file schema (only rewritten
    partitions gain the column). Readers of such a table MUST read
    with ``mergeSchema=true`` or a declared schema — Spark's default
    single-footer inference can pick a pre-tombstone file and drop the
    flag column entirely; the engine's own reads here do so. Retention is what makes deletes
    COMMUTE across batches: a hard delete forgets its version, so a
    stale upsert replayed after it would silently resurrect the key
    (this failure was caught by the permutation test, not theorized).
    ``retain_tombstones=False`` removes the row outright — smaller
    table, but delete/upsert convergence then holds only for changes
    already stored, not against later-arriving stale batches; use it
    only when the source is in-order or replay-free, and purge
    retained tombstones past your out-of-orderness horizon with a
    periodic compaction instead.

    ``version_cols`` turns the unconditional replace into LAST-WRITER-
    WINS CDC resolution: for a matched key, the row with the GREATER
    version tuple survives — whether it came from the target or the
    updates (ties prefer the update; multiple update rows per key
    self-resolve the same way; version NULLs sort last). This makes
    the merge COMMUTATIVE over batch order: out-of-order micro-batches
    (a streaming foreachBatch sink, a backfill racing live traffic)
    converge to the same final table as in-order delivery — the
    property an unconditional upsert cannot give. Cost: contested keys
    run through one window (rank-1 per key) instead of a plain union;
    uncontested target rows still move via the anti-join only.

    Commit protocol — two paths:

    - **Partitioned** (``partition_by`` given): PRUNED DYNAMIC PARTITION
      OVERWRITE. Only the partitions that actually contain an update key
      are read, merged, and rewritten — including the partition a moved
      key is LEAVING (an update may change a key's partition value; the
      old partition must rewrite too or the stale row survives as a
      duplicate) — and every other partition's files are untouched (at
      100 TB this is the difference between rewriting a few GB and
      rewriting the lake). Spark's dynamic overwrite stages
      task output through its commit protocol and deletes a replaced
      partition only at job commit, so a failure mid-write leaves the
      target intact — and this path is object-store-safe (no directory
      rename; the same protocol Spark uses for INSERT OVERWRITE).
    - **Unpartitioned**: copy-on-write — surviving target rows
      (left_anti on the key) union the updates, written to a staging
      directory then swapped in (:func:`_swap_directories`; local-FS
      only, see its caveat). A failure during the write — the long
      part — leaves the target untouched; staging is removed on error.

    ``allow_schema_evolution`` admits ADDITIVE schema change: columns
    present in ``updates`` but not in the table are added (NULL on all
    stored rows). It is strictly additive — an update batch MISSING an
    existing column still errors, because silently nulling the payload
    of every replaced row is a bug, not evolution. An evolved
    partitioned table carries mixed file schemas until every partition
    is rewritten; the engine reads it with ``mergeSchema`` (as must
    external readers — or declare the schema).

    Scale notes: the anti-join shuffles on the key unless the update
    set is broadcastable (it usually is — updates are small relative to
    the lake; AQE broadcasts under the threshold automatically).
    """
    import shutil
    import uuid

    if tombstone_col:
        if not version_cols:
            # without versions, "does the delete or the racing upsert
            # win" is batch-order-dependent — exactly the ambiguity the
            # versioned merge exists to remove
            raise ValueError("tombstone_col requires version_cols")
        if tombstone_col not in updates.columns:
            raise ValueError(f"tombstone_col not in updates: {tombstone_col}")
    # mergeSchema is MANDATORY when the table's files can carry
    # different schemas (tombstone bootstrap, additive evolution — both
    # rewrite only touched partitions): Spark's default single-footer
    # inference can pick an old file and silently drop the newer
    # columns — for tombstones that resurrected deleted keys (caught
    # by live repro, not theory)
    read_path = _resolve_table_path(spark, target_path)
    is_manifest = read_path != target_path
    if is_manifest and partition_by:
        raise ValueError(
            "manifest tables are unpartitioned (their commit unit is the "
            "whole version); partitioned lakes use dynamic overwrite, "
            "which is already object-store-safe"
        )
    if tombstone_col or allow_schema_evolution or is_manifest:
        existing = spark.read.option("mergeSchema", "true").parquet(read_path)
    else:
        existing = spark.read.parquet(read_path)
    flag = {tombstone_col} if tombstone_col else set()
    added = (set(updates.columns) - flag) - set(existing.columns)
    if allow_schema_evolution and added:
        # ADDITIVE evolution only: new update columns join the table as
        # NULL on all stored rows; updates missing an existing column
        # still error (silently nulling replaced rows' payload is a
        # bug, not evolution)
        upd_schema = dict(zip(updates.schema.names, updates.schema.fields))
        for c in sorted(added):
            existing = existing.withColumn(
                c, F.lit(None).cast(upd_schema[c].dataType)
            )
    missing = (set(updates.columns) - flag) ^ (set(existing.columns) - flag)
    if missing:
        raise ValueError(f"update schema mismatch on columns: {sorted(missing)}")
    if tombstone_col and retain_tombstones and tombstone_col not in existing.columns:
        # first use on a pre-tombstone table: the flag becomes a real
        # column; every stored row is live
        existing = existing.withColumn(tombstone_col, F.lit(False))
    if version_cols:
        bad = [c for c in version_cols if c not in updates.columns]
        if bad:
            raise ValueError(f"version_cols not in schema: {bad}")

    up_keys = updates.select(*key_cols).distinct()

    def _merge(existing_subset: DataFrame) -> DataFrame:
        """Resolve updates against a target subset: plain replace, or
        last-writer-wins per key when version_cols is set."""
        keep = existing_subset.join(up_keys, list(key_cols), "left_anti")
        if not version_cols:
            return keep.unionByName(updates)
        from pyspark.sql import Window

        matched = existing_subset.join(up_keys, list(key_cols), "left_semi")
        if tombstone_col and tombstone_col not in matched.columns:
            # flag column absent from the stored table (hard mode, or
            # never bootstrapped): target rows compete as live. When
            # the table DOES carry the column, stored flags are
            # preserved — overwriting them to live would resurrect
            # stored soft tombstones
            matched = matched.withColumn(tombstone_col, F.lit(False))
        contested = matched.withColumn("_upd", F.lit(0)).unionByName(
            updates.withColumn("_upd", F.lit(1))
        )
        # full-row-hash tiebreak (the group_sample idiom): two update
        # rows with EQUAL version tuples but different payloads must
        # resolve the same way on every run/partitioning, or a replay
        # after a crash could produce a different table; only fully
        # identical rows remain interchangeable. Skipped when a map
        # column makes the row unhashable.
        tiebreak = []
        if not any("map<" in t for _, t in updates.dtypes):
            tiebreak = [F.hash(F.struct(*updates.columns)).desc()]
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in version_cols],
            F.col("_upd").desc(),
            *tiebreak,
        )
        winners = (
            contested.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_upd")
        )
        if tombstone_col and retain_tombstones:
            # soft delete: the winning row is stored, flag normalized
            # (NULL = live); readers filter — and the tombstone keeps
            # its version so later stale upserts still lose
            winners = winners.withColumn(
                tombstone_col, F.coalesce(F.col(tombstone_col), F.lit(False))
            )
        elif tombstone_col:
            # hard delete: the key vanishes (NULL flag = live). If the
            # stored table already carries the flag column (built in
            # soft mode earlier), the output keeps that column so the
            # union with the uncontested keep-side stays resolvable —
            # stored soft tombstones outside this batch's keys remain
            # until purge_tombstones
            winners = winners.filter(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            )
            if tombstone_col in existing.columns:
                winners = winners.withColumn(
                    tombstone_col,
                    F.coalesce(F.col(tombstone_col), F.lit(False)),
                )
            else:
                winners = winners.drop(tombstone_col)
        return keep.unionByName(winners)

    if partition_by:
        # Touched partitions = partitions the UPDATES land in, PLUS the
        # partitions currently holding any updated key — an update can
        # MOVE a key across partitions, and skipping the old partition
        # would leave the stale row behind (duplicate keys). Finding
        # the old partitions costs one keys-only semi join over the
        # target; callers whose partition values are derived from the
        # key (so keys never move) can skip it with
        # ``keys_partition_stable=True`` and prune purely from updates.
        from functools import reduce

        touched_df = updates.select(*partition_by)
        if not keys_partition_stable:
            moved = existing.join(up_keys, list(key_cols), "left_semi").select(
                *partition_by
            )
            touched_df = touched_df.unionByName(moved)
        touched = touched_df.distinct().collect()
        if not touched:
            return
        # every touched partition's subdir must be expressible BEFORE
        # anything mutates the lake: an unescapable value should fail
        # the merge up front, not after the dynamic overwrite committed
        for r in touched:
            _partition_subdir(partition_by, r)
        pruned = _prune_to_partitions(existing, touched, partition_by)
        merged = _merge(pruned)
        # one execution for both consumers below: without the pin, the
        # emptied-partition collect and the write would each run the
        # whole touched-partition read + anti-join
        merged.persist()
        try:
            # Dynamic overwrite replaces only partitions that RECEIVE
            # rows: a touched partition whose every row moved away gets
            # no output and would keep its stale files. Find those
            # EMPTIED partitions before the write (merged reads the
            # target, so afterwards is too late) and delete their
            # directories post-commit via the Hadoop FileSystem (one
            # code path for file:// and object stores). The deletion is
            # idempotent — a crash between write and delete leaves
            # stale rows that re-running the same merge removes.
            merged_parts = {
                tuple(r[c] for c in partition_by)
                for r in merged.select(*partition_by).distinct().collect()
            }
            emptied = [
                r for r in touched
                if tuple(r[c] for c in partition_by) not in merged_parts
            ]
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_by)
                .parquet(target_path)
            )
        finally:
            merged.unpersist()
        for r in emptied:
            _delete_partition_dir(spark, target_path, partition_by, r)
        return

    merged = _merge(existing)
    if is_manifest:
        # object-store-safe: new immutable version dir + pointer commit
        _manifest_commit(spark, target_path, merged)
        return
    staging = f"{target_path}__staging_{uuid.uuid4().hex[:8]}"
    try:
        merged.write.mode("overwrite").parquet(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _swap_directories(target_path, staging)


def purge_tombstones(
    spark,
    path: str,
    tombstone_col: str,
    horizon: "Column | None" = None,
    partition_by: Sequence[str] | None = None,
) -> int:
    """Drop retained soft tombstones from a CDC table — the periodic
    compaction that bounds a ``merge_upsert(retain_tombstones=True)``
    lake. Purge ONLY tombstones older than your out-of-orderness
    horizon (pass ``horizon`` as a boolean Column over the row, e.g.
    ``col('ts') < lit(cutoff)``): purging a younger tombstone reopens
    the resurrection window the retained flag exists to close — a
    stale upsert replayed after the purge would reinsert the key. A
    tombstone whose horizon evaluates to NULL is KEPT (can't prove
    it's past the horizon ⇒ not purgeable) and not counted. Stored
    NULL flags are live and always kept.

    Pass the SAME ``partition_by`` the merges use: the purge then
    rewrites only the partitions that actually hold purgeable rows
    (pruned dynamic overwrite, partitions emptied by the purge have
    their directories removed) and the table keeps its layout — a
    layout-blind flat rewrite would leave files where partition
    discovery never finds them again. Unpartitioned tables use
    copy-on-write staging + swap (commit caveats as
    :func:`compact_small_files`). Returns the number of rows purged.

    Scale shape (partitioned): one column-pruned stats aggregation
    gives the driver purged/affected/emptied in a single bounded
    collect, then ONE pruned read feeds the dynamic overwrite —
    affected-partition pruning switches from a literal predicate to a
    broadcast semi join past 64 partitions, exactly as
    :func:`merge_upsert` does."""
    import shutil
    import uuid

    read_path = _resolve_table_path(spark, path)
    is_manifest = read_path != path
    if is_manifest and partition_by:
        raise ValueError("manifest tables are unpartitioned")
    df = spark.read.option("mergeSchema", "true").parquet(read_path)
    if tombstone_col not in df.columns:
        raise ValueError(f"tombstone_col not in table: {tombstone_col}")
    doomed = F.coalesce(F.col(tombstone_col), F.lit(False))
    if horizon is not None:
        doomed = doomed & F.coalesce(horizon, F.lit(False))

    if partition_by:
        # ONE column-pruned stats scan (partition cols + the flag/
        # horizon columns only) yields everything the driver needs —
        # purged count, affected partitions, partitions the purge
        # EMPTIES — as one bounded collect (≤ one row per affected
        # partition). The old shape read the full table three times
        # (doomed count, affected collect, survivor-partition collect)
        # before the write even started.
        stats = (
            df.groupBy(*partition_by)
            .agg(
                F.sum(F.when(doomed, 1).otherwise(0)).alias("_doomed"),
                F.sum(F.when(~doomed, 1).otherwise(0)).alias("_live"),
            )
            .filter(F.col("_doomed") > 0)
            .collect()
        )
        purged = sum(r["_doomed"] for r in stats)
        if purged == 0:
            return 0
        affected = stats
        emptied = {
            tuple(r[c] for c in partition_by)
            for r in stats
            if r["_live"] == 0
        }
        pruned = _prune_to_partitions(df, affected, partition_by)
        survivors = pruned.filter(~doomed)
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
        for r in affected:
            if tuple(r[c] for c in partition_by) in emptied:
                _delete_partition_dir(spark, path, partition_by, r)
        return purged

    purged = df.filter(doomed).count()
    if purged == 0:
        return 0

    if is_manifest:
        _manifest_commit(spark, path, df.filter(~doomed))
        return purged
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    try:
        df.filter(~doomed).write.mode("overwrite").parquet(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _swap_directories(path, staging)
    return purged


def compact_small_files(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Compact a parquet directory's small-file dust into
    ~``target_rows_per_file`` files (the maintenance job every
    streaming/append lake needs: availableNow micro-batches and
    per-trigger appends leave thousands of KB-sized files whose
    open/footer cost eventually dominates scans). Returns the new file
    count. Copy-on-write via staging + swap (see
    :func:`_swap_directories` for the commit caveats); a failure during
    the rewrite leaves the original directory untouched and removes the
    staging dir."""
    import math
    import os
    import shutil
    import uuid

    read_path = _resolve_table_path(spark, path)
    df = spark.read.parquet(read_path)
    n = df.count()
    files = max(1, math.ceil(n / target_rows_per_file))
    if read_path != path:
        _manifest_commit(spark, path, df.repartition(files))
        # count through the Hadoop FS — a manifest table may live on an
        # object store where os.listdir has no meaning
        fs, live_p, _ = _hadoop_fs(spark, _resolve_table_path(spark, path))
        return sum(
            1
            for st in fs.listStatus(live_p)
            if st.getPath().getName().startswith("part-")
            and st.getPath().getName().endswith(".parquet")
        )
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    try:
        df.repartition(files).write.mode("overwrite").parquet(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _swap_directories(path, staging)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet") and f.startswith("part-")
    )
