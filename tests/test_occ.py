"""Optimistic-concurrency tests for manifest-table commits.

The commit log (``_commits/c_<seq>`` markers claimed by atomic
rename-no-overwrite) replaces the old single-writer assumption: a
racing commit becomes a detected conflict + automatic rebase, never a
lost update, and a writer crashing between its marker claim and its
pointer publish neither wedges nor loses the table (readers roll the
pointer forward through newer markers).
"""

from __future__ import annotations

import os
import time

import pytest

from async_pipes_spark.sources import sinks
from async_pipes_spark.sources.sinks import (
    ConcurrentCommitError,
    compact_small_files,
    manifest_version,
    merge_upsert,
    read_manifest_table,
    read_partitioned_manifest,
    vacuum_manifest,
    write_manifest_table,
    write_partitioned_manifest_table,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_claim_commit_slot_is_exclusive(spark, tmp_path):
    tgt = str(tmp_path / "claim")
    assert sinks._claim_commit(spark, tgt, 1, "v_a\n#keep=2\n#seq=1\n")
    assert not sinks._claim_commit(spark, tgt, 1, "v_b\n#keep=2\n#seq=1\n")
    assert sinks._claim_commit(spark, tgt, 2, "v_b\nv_a\n#keep=2\n#seq=2\n")


def test_read_rolls_forward_past_unpublished_commit(spark, tmp_path):
    """A commit is durable the instant its marker lands: if the writer
    crashes before the pointer publish, readers still resolve the new
    version and the NEXT commit chains on top of it (republishing the
    pointer) — the table is never wedged behind a dead writer."""
    tgt = str(tmp_path / "rollfwd")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    v1 = manifest_version(spark, tgt)
    # simulate writer-crash-after-claim: real data dir + claimed marker,
    # pointer never republished
    spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string").write.parquet(
        f"{tgt}/_data/v_unpublished"
    )
    assert sinks._claim_commit(
        spark, tgt, 2, f"v_unpublished\n{v1}\n#keep=2\n#seq=2\n"
    )
    # readers roll forward to the durable-but-unpublished commit
    assert manifest_version(spark, tgt) == "v_unpublished"
    assert read_manifest_table(spark, tgt).count() == 2
    # the next commit chains on seq 3 and repairs the pointer
    merge_upsert(
        spark, tgt,
        spark.createDataFrame([(3, "c")], "k bigint, s string"),
        ["k"],
    )
    assert sinks._raw_pointer_seq(spark, tgt) == 3
    assert _rows(read_manifest_table(spark, tgt), "k", "s") == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_concurrent_flat_merge_rebases_not_lost(spark, tmp_path, monkeypatch):
    """The lost-update scenario the old single-writer contract ruled
    out by fiat: writer B commits AFTER writer A read its base but
    BEFORE A's commit. A's claim loses, A detects the conflict and
    automatically re-merges against B's result — the final table
    carries BOTH writers' changes."""
    tgt = str(tmp_path / "occ_flat")
    write_manifest_table(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string"),
        tgt,
    )
    real_claim = sinks._claim_commit
    state = {"injected": False}

    def claim_with_race(spark_, path, seq, body):
        if not state["injected"]:
            state["injected"] = True
            # writer B lands a full merge first (uses the real claim
            # directly — `injected` is already set)
            merge_upsert(
                spark_, path,
                spark_.createDataFrame([(2, "B!")], "k bigint, s string"),
                ["k"],
            )
        return real_claim(spark_, path, seq, body)

    monkeypatch.setattr(sinks, "_claim_commit", claim_with_race)
    merge_upsert(
        spark, tgt,
        spark.createDataFrame([(3, "c")], "k bigint, s string"),
        ["k"],
    )
    assert _rows(read_manifest_table(spark, tgt), "k", "s") == [
        (1, "a"), (2, "B!"), (3, "c"),
    ]
    # base write = seq 1, B = seq 2, A's rebased commit = seq 3
    assert sinks._raw_pointer_seq(spark, tgt) == 3


def test_concurrent_partitioned_merge_rebases_not_lost(
    spark, tmp_path, monkeypatch
):
    tgt = str(tmp_path / "occ_part")
    write_partitioned_manifest_table(
        spark,
        spark.createDataFrame(
            [(1, "a", "p1"), (2, "b", "p2")], "k bigint, s string, p string"
        ),
        tgt,
        ["p"],
    )
    real_claim = sinks._claim_commit
    state = {"injected": False}

    def claim_with_race(spark_, path, seq, body):
        if not state["injected"]:
            state["injected"] = True
            merge_upsert(
                spark_, path,
                spark_.createDataFrame(
                    [(2, "B!", "p2")], "k bigint, s string, p string"
                ),
                ["k"],
                partition_by=["p"],
            )
        return real_claim(spark_, path, seq, body)

    monkeypatch.setattr(sinks, "_claim_commit", claim_with_race)
    merge_upsert(
        spark, tgt,
        spark.createDataFrame([(3, "c", "p1")], "k bigint, s string, p string"),
        ["k"],
        partition_by=["p"],
    )
    assert _rows(read_partitioned_manifest(spark, tgt), "k", "s", "p") == [
        (1, "a", "p1"), (2, "B!", "p2"), (3, "c", "p1"),
    ]


def test_conflict_escapes_when_retries_exhausted(spark, tmp_path, monkeypatch):
    tgt = str(tmp_path / "occ_exhaust")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    real_claim = sinks._claim_commit
    state = {"in_b": False}

    def always_race(spark_, path, seq, body):
        if state["in_b"]:
            return real_claim(spark_, path, seq, body)
        # every attempt of writer A is beaten by a competing blind write
        state["in_b"] = True
        try:
            write_manifest_table(
                spark_,
                spark_.createDataFrame([(9, "z")], "k bigint, s string"),
                path,
            )
        finally:
            state["in_b"] = False
        return real_claim(spark_, path, seq, body)

    monkeypatch.setattr(sinks, "_claim_commit", always_race)
    with pytest.raises(ConcurrentCommitError):
        merge_upsert(
            spark, tgt,
            spark.createDataFrame([(2, "b")], "k bigint, s string"),
            ["k"],
            occ_retries=1,
        )
    # the table is the competitor's last blind write — never corrupt
    assert read_manifest_table(spark, tgt).count() == 1


def test_maintenance_compaction_rebases_over_concurrent_merge(
    spark, tmp_path, monkeypatch
):
    """OPTIMIZE-style maintenance is a read-modify-write too: a merge
    landing mid-compaction must survive (the old backstop silently
    kept last-pointer-wins; now the compaction rebases on the merged
    table)."""
    tgt = str(tmp_path / "occ_compact")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    real_claim = sinks._claim_commit
    state = {"injected": False}

    def claim_with_race(spark_, path, seq, body):
        if not state["injected"]:
            state["injected"] = True
            merge_upsert(
                spark_, path,
                spark_.createDataFrame([(2, "b")], "k bigint, s string"),
                ["k"],
            )
        return real_claim(spark_, path, seq, body)

    monkeypatch.setattr(sinks, "_claim_commit", claim_with_race)
    compact_small_files(spark, tgt, target_rows_per_file=10)
    assert _rows(read_manifest_table(spark, tgt), "k", "s") == [
        (1, "a"), (2, "b"),
    ]


def test_stale_slot_aba_guard_aborts(spark, tmp_path, monkeypatch):
    """A writer whose read stalled long enough for its slot number to
    have been used AND vacuumed must abort, not regress the pointer:
    the post-claim raw-pointer recheck catches it."""
    tgt = str(tmp_path / "occ_aba")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    for i in range(2, 5):
        merge_upsert(
            spark, tgt,
            spark.createDataFrame([(i, "x")], "k bigint, s string"),
            ["k"],
        )
    assert sinks._raw_pointer_seq(spark, tgt) == 4
    # the stalled writer's view: seq 1, and slot 2's marker vacuumed
    vacuum_manifest(spark, tgt, grace_seconds=0, marker_retain=1)
    live = manifest_version(spark, tgt)
    monkeypatch.setattr(
        sinks, "_manifest_read", lambda s, p: ([live], 2, 1)
    )
    with pytest.raises(ConcurrentCommitError, match="stale commit slot"):
        sinks._manifest_commit(
            spark, tgt,
            spark.createDataFrame([(9, "z")], "k bigint, s string"),
        )
    monkeypatch.undo()
    # its re-claimed stale marker was released and the table is intact
    assert not os.path.exists(f"{tgt}/_commits/c_{2:012d}")
    assert sinks._raw_pointer_seq(spark, tgt) == 4
    assert read_manifest_table(spark, tgt).count() == 4


def test_legacy_pointer_without_seq_upgrades(spark, tmp_path):
    """A table committed before the commit log existed (pointer with no
    ``#seq=`` line, no ``_commits/``) merges cleanly: seq parses as 0,
    the first OCC commit claims slot 1."""
    tgt = str(tmp_path / "legacy")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    v1 = manifest_version(spark, tgt)
    # rewrite the pointer in the pre-OCC format and drop the commit log
    sinks._replace_pointer(spark, f"{tgt}/_MANIFEST", f"{v1}\n#keep=2\n")
    import shutil

    shutil.rmtree(f"{tgt}/_commits")
    merge_upsert(
        spark, tgt,
        spark.createDataFrame([(2, "b")], "k bigint, s string"),
        ["k"],
    )
    assert sinks._raw_pointer_seq(spark, tgt) == 1
    assert read_manifest_table(spark, tgt).count() == 2


def test_vacuum_reclaims_old_orphans_only(spark, tmp_path):
    tgt = str(tmp_path / "vac")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    merge_upsert(
        spark, tgt,
        spark.createDataFrame([(2, "b")], "k bigint, s string"),
        ["k"],
    )
    retained = set(sinks.manifest_versions(spark, tgt))
    # an old crashed-commit orphan, and a fresh one (possibly a live
    # concurrent writer mid-commit)
    old_orphan = tmp_path / "vac" / "_data" / "v_old_orphan"
    old_orphan.mkdir()
    (old_orphan / "junk.parquet").write_bytes(b"x")
    past = time.time() - 7 * 86_400
    os.utime(old_orphan, (past, past))
    new_orphan = tmp_path / "vac" / "_data" / "v_new_orphan"
    new_orphan.mkdir()
    counts = vacuum_manifest(spark, tgt, grace_seconds=86_400)
    assert counts["data_dirs"] == 1
    on_disk = {p.name for p in (tmp_path / "vac" / "_data").iterdir()}
    assert on_disk == retained | {"v_new_orphan"}
    # retained lineage untouched, table intact
    assert read_manifest_table(spark, tgt).count() == 2


def test_vacuum_prunes_old_markers(spark, tmp_path):
    tgt = str(tmp_path / "vacm")
    write_manifest_table(
        spark, spark.createDataFrame([(1, "a")], "k bigint, s string"), tgt
    )
    for i in range(2, 7):
        merge_upsert(
            spark, tgt,
            spark.createDataFrame([(i, "x")], "k bigint, s string"),
            ["k"],
        )
    assert sinks._raw_pointer_seq(spark, tgt) == 6
    counts = vacuum_manifest(spark, tgt, grace_seconds=0, marker_retain=2)
    assert counts["markers"] == 4  # c_1..c_4 pruned, c_5/c_6 kept
    kept = sorted(
        n for n in os.listdir(f"{tgt}/_commits") if n.startswith("c_")
    )
    assert kept == [f"c_{5:012d}", f"c_{6:012d}"]
    assert read_manifest_table(spark, tgt).count() == 6


def test_vacuum_partitioned_reclaims_dropped_gen_orphans(spark, tmp_path):
    tgt = str(tmp_path / "vacp")
    write_partitioned_manifest_table(
        spark,
        spark.createDataFrame([(1, "a", "p1")], "k bigint, s string, p string"),
        tgt,
        ["p"],
    )
    # an old orphan version dir + an old orphan gen file
    for sub, name in (("_data", "v_orph"), ("_gens", "g_orph")):
        d = tmp_path / "vacp" / sub / name
        if sub == "_data":
            d.mkdir()
        else:
            d.write_text("p=zz\tv_orph\n")
        past = time.time() - 7 * 86_400
        os.utime(d, (past, past))
    counts = vacuum_manifest(spark, tgt, grace_seconds=86_400)
    assert counts["data_dirs"] == 1 and counts["gen_files"] == 1
    assert read_partitioned_manifest(spark, tgt).count() == 1
