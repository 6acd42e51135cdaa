"""Incrementally maintained aggregated JOIN views
(`sources/ivm_join.py`): every refresh must equal the direct
``A JOIN B [WHERE f] GROUP BY g`` recompute — across change programs
on either or both sides, duplicate join keys (multiset join), NULL
join keys, filter boundary crossings, base-moving verbs, and the
kind guard that keeps each refresher on its own views."""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from async_pipes_spark.sources.ivm import read_agg_view, refresh_agg_view
from async_pipes_spark.sources.ivm_join import (
    create_join_view,
    read_join_view,
    refresh_join_view,
)
from async_pipes_spark.sources.sinks import (
    compact_small_files,
    mor_upsert,
    read_table,
    write_manifest_table,
)

A_SCHEMA = "ak int, jk int, x long, aver int, adead boolean"
B_SCHEMA = "bk int, jk int, g int, bver int, bdead boolean"
AGGS = {
    "sx": ("sum", "x"),
    "n": ("count", "*"),
    "ax": ("avg", "x"),
}


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ivmj_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, tmpdir, n_a=20, n_b=8):
    a_path, b_path = f"{tmpdir}/a", f"{tmpdir}/b"
    # A: facts — jk fans out over B's keys, including a jk B lacks (9)
    a_rows = [(i, i % 10, i * 10, 0, False) for i in range(n_a)]
    # B: dims — includes a DUPLICATE join key (jk=1 twice: multiset
    # join must double those A rows) and a NULL jk (matches nothing)
    b_rows = [(j, j, j % 3, 0, False) for j in range(n_b)]
    b_rows += [(100, 1, 2, 0, False), (101, None, 0, 0, False)]
    write_manifest_table(
        spark, spark.createDataFrame(a_rows, A_SCHEMA), a_path
    )
    write_manifest_table(
        spark, spark.createDataFrame(b_rows, B_SCHEMA), b_path
    )
    return a_path, b_path


def _up_a(spark, path, rows):
    mor_upsert(spark, path, spark.createDataFrame(rows, A_SCHEMA), ["ak"],
               version_cols=["aver"], tombstone_col="adead")


def _up_b(spark, path, rows):
    mor_upsert(spark, path, spark.createDataFrame(rows, B_SCHEMA), ["bk"],
               version_cols=["bver"], tombstone_col="bdead")


def _expected(spark, a_path, b_path, filt=None):
    a = read_table(spark, a_path).where(
        ~F.coalesce(F.col("adead"), F.lit(False))
    )
    b = read_table(spark, b_path).where(
        ~F.coalesce(F.col("bdead"), F.lit(False))
    )
    j = a.join(b, ["jk"])
    if filt:
        j = j.where(filt)
    out = j.groupBy("g").agg(
        F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("x") / F.count("x")).alias("ax"),
    )
    return {r["g"]: (r["sx"], r["n"], r["ax"]) for r in out.collect()}


def _got(spark, view):
    return {
        r["g"]: (r["sx"], r["n"], r["ax"])
        for r in read_join_view(spark, view).collect()
    }


def test_create_matches_direct_join(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    st = create_join_view(
        spark, a, b, view, ["jk"], ["g"], AGGS,
        left_tombstone_col="adead", right_tombstone_col="bdead",
    )
    assert st["seq"] == 0 and st["kind"] == "join"
    assert _got(spark, view) == _expected(spark, a, b)


def test_left_side_changes_only(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    # move a fact to another join key, delete one, insert one with a
    # NULL value (non-null counter path), one with an unmatched jk
    _up_a(spark, a, [(0, 5, 999, 1, False), (3, 3, None, 1, False),
                     (1, 1, 0, 1, True), (50, 9, 70, 1, False)])
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental" and s["deltas_consumed"] == 1, s
    assert _got(spark, view) == _expected(spark, a, b)
    assert refresh_join_view(spark, view)["mode"] == "noop"


def test_right_side_changes_only(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    # dim rows move groups / die / appear — every matched fact's
    # contribution must follow (the join-move case)
    _up_b(spark, b, [(1, 1, 0, 1, False),      # g 1 -> 0
                     (2, 2, 2, 1, True),       # dim dies: facts drop out
                     (200, 9, 1, 1, False)])   # jk 9 now matched
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental", s
    assert _got(spark, view) == _expected(spark, a, b)


def test_both_sides_change_between_refreshes(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    _up_a(spark, a, [(0, 7, -40, 1, False), (21, 1, 5, 0, False)])
    _up_b(spark, b, [(7, 7, 1, 1, False), (0, 0, 1, 1, True)])
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental" and s["deltas_consumed"] == 2, s
    assert _got(spark, view) == _expected(spark, a, b)
    # second round exercises the CURSORED windows on both sides
    _up_a(spark, a, [(2, 2, 1000, 1, False)])
    _up_b(spark, b, [(100, 1, 0, 1, True)])  # one of the DUP jk=1 rows
    s2 = refresh_join_view(spark, view)
    assert s2["mode"] == "incremental" and s2["deltas_consumed"] == 2, s2
    assert _got(spark, view) == _expected(spark, a, b)


def test_duplicate_join_keys_multiply(spark, tmpdir):
    """B carries jk=1 twice: every A row with jk=1 counts TWICE in the
    view (multiset join). An A-side insert on jk=1 must add 2."""
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    before = _got(spark, view)
    _up_a(spark, a, [(60, 1, 7, 0, False)])
    refresh_join_view(spark, view)
    after = _got(spark, view)
    assert after == _expected(spark, a, b)
    # jk=1 maps to g in {1, 2} (bk=1 g=1; bk=100 g=2): both groups
    # gained exactly one joined row
    assert after[1][1] == before[1][1] + 1
    assert after[2][1] == before[2][1] + 1


def test_filtered_join_view_boundary(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(
        spark, a, b, view, ["jk"], ["g"], AGGS,
        left_tombstone_col="adead", right_tombstone_col="bdead",
        filter_expr="x >= 50",
    )
    assert _got(spark, view) == _expected(spark, a, b, "x >= 50")
    # cross INTO (x 10->90) and OUT of (x 120->0) the predicate
    _up_a(spark, a, [(1, 1, 90, 1, False), (12, 2, 0, 1, False)])
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental", s
    assert _got(spark, view) == _expected(spark, a, b, "x >= 50")


def test_base_move_either_side_downgrades(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    _up_a(spark, a, [(0, 0, 1, 1, False)])
    refresh_join_view(spark, view)
    compact_small_files(spark, a)
    s = refresh_join_view(spark, view)
    assert s["mode"] == "full" and s["reason"] == "source-base-moved", s
    assert _got(spark, view) == _expected(spark, a, b)
    _up_b(spark, b, [(3, 3, 0, 1, False)])
    refresh_join_view(spark, view)
    compact_small_files(spark, b)
    s2 = refresh_join_view(spark, view)
    assert s2["mode"] == "full", s2
    assert _got(spark, view) == _expected(spark, a, b)
    # and the re-armed cursors keep the incremental lane alive
    _up_a(spark, a, [(5, 5, 5, 1, False)])
    assert refresh_join_view(spark, view)["mode"] == "incremental"
    assert _got(spark, view) == _expected(spark, a, b)


def test_kind_guards(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    with pytest.raises(ValueError, match="not a single-table agg view"):
        refresh_agg_view(spark, view)
    from async_pipes_spark.sources.ivm import create_agg_view

    view2 = f"{tmpdir}/v2"
    create_agg_view(spark, b, view2, ["g"], {"nb": ("count", "*")},
                    src_tombstone_col="bdead")
    with pytest.raises(ValueError, match="not a join view"):
        refresh_join_view(spark, view2)
    # the shared reader serves both
    assert read_agg_view(spark, view).columns == ["g", "sx", "n", "ax"]


def test_validation(spark, tmpdir):
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    with pytest.raises(ValueError, match="unsupported aggregate"):
        create_join_view(spark, a, b, view, ["jk"], ["g"],
                         {"md": ("median", "x")})
    with pytest.raises(ValueError, match="filter_expr does not analyze"):
        create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                         filter_expr="no_such_col > 3")
    with pytest.raises(ValueError, match="join_keys is required"):
        create_join_view(spark, a, b, view, [], ["g"], AGGS)
    with pytest.raises(ValueError, match="not on both sides"):
        create_join_view(spark, a, b, view, ["ak"], ["g"], AGGS)
    # engineer a non-key column clash: a second A-like table
    c = f"{tmpdir}/c"
    write_manifest_table(
        spark,
        spark.createDataFrame([(1, 1, 2, 0, False)], A_SCHEMA),
        c,
    )
    with pytest.raises(ValueError, match="both sides"):
        create_join_view(spark, a, c, view, ["jk"], ["x"], {"s": ("sum", "x")})


MMAGGS = {
    "sx": ("sum", "x"),
    "n": ("count", "*"),
    "mn": ("min", "x"),
    "mx": ("max", "x"),
    "dx": ("count_distinct", "x"),   # companion reduction rides along:
                                     # every min/max scenario below also
                                     # exercises the joined two-level fold
}


def _expected_mm(spark, a_path, b_path, group="g", filt=None):
    a = read_table(spark, a_path).where(
        ~F.coalesce(F.col("adead"), F.lit(False))
    )
    b = read_table(spark, b_path).where(
        ~F.coalesce(F.col("bdead"), F.lit(False))
    )
    j = a.join(b, ["jk"])
    if filt:
        j = j.where(filt)
    out = j.groupBy(group).agg(
        F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.countDistinct("x").alias("dx"),
    )
    return {r[group]: (r["sx"], r["n"], r["mn"], r["mx"], r["dx"])
            for r in out.collect()}


def _got_mm(spark, view, group="g"):
    return {
        r[group]: (r["sx"], r["n"], r["mn"], r["mx"], r["dx"])
        for r in read_join_view(spark, view).collect()
    }


def test_minmax_join_view_extreme_holders_both_sides(spark, tmpdir):
    """min/max on a join view (round-10 verdict missing #1): delete the
    extreme-HOLDING rows on the fact side AND kill the dim row whose
    joined rows hold a group's extreme — both must route through the
    needy-group recompute lane and land exactly on the direct join."""
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], MMAGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    assert _got_mm(spark, view) == _expected_mm(spark, a, b)
    # fact-side: kill the largest JOINED x (ak=17, jk=7, x=170 — ak
    # 18/19 carry unmatched jks) — its group's max falls to a SURVIVOR
    # the feed never mentions
    _up_a(spark, a, [(17, None, None, 1, True)])
    s1 = refresh_join_view(spark, view)
    assert s1["mode"] == "incremental" and s1["minmax_recompute"], s1
    assert _got_mm(spark, view) == _expected_mm(spark, a, b)
    # fact-side: kill a group MIN holder (smallest x joined anywhere:
    # ak=0, x=0 — jk 0 matches bk=0)
    _up_a(spark, a, [(0, None, None, 2, True)])
    s2 = refresh_join_view(spark, view)
    assert s2["mode"] == "incremental", s2
    assert _got_mm(spark, view) == _expected_mm(spark, a, b)
    # dim-side: kill bk=8? (doesn't exist) — kill bk=7: every jk=7
    # fact leaves its group; extremes must be recomputed or absorbed
    _up_b(spark, b, [(7, None, 0, 1, True)])
    s3 = refresh_join_view(spark, view)
    assert s3["mode"] == "incremental", s3
    assert _got_mm(spark, view) == _expected_mm(spark, a, b)
    # and additions that ABSORB (new global max) must skip the source:
    _up_a(spark, a, [(70, 1, 100000, 0, False)])
    s4 = refresh_join_view(spark, view)
    assert s4["mode"] == "incremental" and not s4["minmax_recompute"], s4
    assert _got_mm(spark, view) == _expected_mm(spark, a, b)
    assert refresh_join_view(spark, view)["mode"] == "noop"


def test_minmax_group_on_fact_side(spark, tmpdir):
    """Group columns living on the FACT side (group by ak): the dim
    side carries no group column, so its recompute slice is pruned by
    the fact slice's JOIN KEYS — the gb-empty lane."""
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["ak"], MMAGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    assert _got_mm(spark, view, "ak") == _expected_mm(spark, a, b, "ak")
    # move a dup-keyed fact's x down: group ak=11 (jk=1, joins twice)
    # loses its max holder via an UPDATE (pre-image removes x=110)
    _up_a(spark, a, [(11, 1, 3, 1, False)])
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental" and s["minmax_recompute"], s
    assert _got_mm(spark, view, "ak") == _expected_mm(spark, a, b, "ak")
    # dim-side change: a dup jk=1 dim row dies — ak groups on jk=1
    # lose one joined copy each (multiset shrink, extremes recompute)
    _up_b(spark, b, [(100, None, 0, 1, True)])
    s2 = refresh_join_view(spark, view)
    assert s2["mode"] == "incremental", s2
    assert _got_mm(spark, view, "ak") == _expected_mm(spark, a, b, "ak")


def test_minmax_group_on_join_key(spark, tmpdir):
    """Group by the join key itself — both sides carry the group
    column, so both recompute slices prune by group directly."""
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["jk"], MMAGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    assert _got_mm(spark, view, "jk") == _expected_mm(spark, a, b, "jk")
    _up_a(spark, a, [(17, None, None, 1, True)])  # x=170, max of jk=7
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental" and s["minmax_recompute"], s
    assert _got_mm(spark, view, "jk") == _expected_mm(spark, a, b, "jk")


def test_minmax_filtered_join_view(spark, tmpdir):
    """min/max + filter_expr: the recompute slice must re-apply the
    predicate (a survivor OUTSIDE the filter must not become the new
    extreme)."""
    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(
        spark, a, b, view, ["jk"], ["g"], MMAGGS,
        left_tombstone_col="adead", right_tombstone_col="bdead",
        filter_expr="x < 150",
    )
    assert _got_mm(spark, view) == _expected_mm(spark, a, b, "g", "x < 150")
    # kill the in-filter max of its group; the out-of-filter rows
    # (x >= 150) must NOT fill the hole
    _up_a(spark, a, [(14, None, None, 1, True)])  # x=140
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental", s
    assert _got_mm(spark, view) == _expected_mm(spark, a, b, "g", "x < 150")


def test_minmax_recompute_key_prune_plan(spark, tmpdir, monkeypatch):
    """Scale audit of the recompute lane (round-11): under a
    dim-grouped... inverted here — group col on the FACT side, so the
    DIM side carries no group column and must be pruned by the fact
    slice's JOIN KEYS. Pins (a) the lane actually takes the isin path
    under the cap (spy on _keys_probe sees a non-None inline), and
    (b) that isin over the engine's own table read reaches the parquet
    scan as a pushed In() filter — together: the recompute never
    rescans the unpruned side."""
    import contextlib
    import io

    from async_pipes_spark.sources import ivm_join as ivj

    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["ak"], MMAGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    probes = []
    real = ivj._keys_probe

    def spy(spark_, signed, join_keys, small, feed_pinned=False):
        keys, inline = real(spark_, signed, join_keys, small,
                            feed_pinned=feed_pinned)
        probes.append(inline)
        return keys, inline

    monkeypatch.setattr(ivj, "_keys_probe", spy)
    # remove the max holders of groups ak=11 (jk 1) and ak=17 (jk 7)
    # via updates: recompute lane with a 2-key probe (a 1-key isin
    # folds to EqualTo — two keys keep the In() shape under audit)
    _up_a(spark, a, [(11, 1, 3, 1, False), (17, 7, 4, 1, False)])
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental" and s["minmax_recompute"], s
    assert _got_mm(spark, view, "ak") == _expected_mm(spark, a, b, "ak")
    # the lane ran at least one key probe and EVERY probe this small
    # window produced inlined (<= cap) keys — the isin path
    assert probes and all(p is not None for p in probes), probes
    # and the engine's single-parse IN list over its read path is a
    # PUSHED filter: the B-side scan's row groups prune by footer
    # stats on jk (r12: _in_expr replaced Column.isin on this lane —
    # same In() predicate, one py4j round-trip instead of one per key)
    sliced = read_table(spark, b).where(ivj._in_expr("jk", probes[-1]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sliced.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "In(jk" in plan, plan


@pytest.mark.parametrize("flavor", ["flat", "partitioned"])
def test_full_verb_model_both_flavors_join(spark, tmpdir, flavor):
    """Round-11 model net (verdict #3): a seeded random program over
    EVERY base-moving verb on BOTH sides INDEPENDENTLY — mor upserts,
    COW merge, compaction, z-order, tombstone purge, restore, view
    optimize — on both manifest flavors, with min/max in the aggregate
    set (so the needy lane runs under the verbs too) and view ==
    direct join GROUP BY asserted after every step. No hand-kept
    model: the oracle is the resolved pair itself, so restore needs no
    bookkeeping."""
    from async_pipes_spark.sources.ivm import optimize_agg_view
    from async_pipes_spark.sources.sinks import (
        manifest_versions,
        merge_upsert,
        mor_deltas,
        optimize_zorder,
        partitioned_manifest_generations,
        purge_tombstones,
        restore_manifest_table,
        write_partitioned_manifest_table,
    )

    rng = random.Random(0xBEEF11 if flavor == "flat" else 0xFEED11)
    a, b_path = f"{tmpdir}/a", f"{tmpdir}/b"
    # partition columns must be non-NULL for the partitioned flavor
    a_rows = [(i, i % 10, i * 10, 0, False) for i in range(20)]
    b_rows = [(j, j, j % 3, 0, False) for j in range(8)]
    b_rows += [(100, 1, 2, 0, False)]
    if flavor == "flat":
        b_rows += [(101, None, 0, 0, False)]
        write_manifest_table(
            spark, spark.createDataFrame(a_rows, A_SCHEMA), a)
        write_manifest_table(
            spark, spark.createDataFrame(b_rows, B_SCHEMA), b_path)
    else:
        write_partitioned_manifest_table(
            spark, spark.createDataFrame(a_rows, A_SCHEMA), a, ["jk"])
        write_partitioned_manifest_table(
            spark, spark.createDataFrame(b_rows, B_SCHEMA), b_path, ["g"])
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b_path, view, ["jk"], ["g"], MMAGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")

    def rand_a(ver):
        jk = (rng.randint(0, 11) if flavor == "partitioned"
              else rng.choice([None] + list(range(11))))
        return (rng.randint(0, 30), jk,
                rng.choice([None, rng.randint(-500, 500)]),
                ver, rng.random() < 0.25)

    def rand_b(ver):
        g = (rng.randint(0, 3) if flavor == "partitioned"
             else rng.choice([None] + list(range(4))))
        return (rng.randint(0, 102),
                rng.choice([None] + list(range(11))) if flavor == "flat"
                else rng.randint(0, 11),
                g, ver, rng.random() < 0.25)

    aver = bver = 0
    part = flavor == "partitioned"
    sides = {
        "a": (a, A_SCHEMA, ["ak"], ["aver"], "adead",
              ["jk"] if part else None),
        "b": (b_path, B_SCHEMA, ["bk"], ["bver"], "bdead",
              ["g"] if part else None),
    }
    for step in range(10):
        side = rng.choice(["a", "b"])
        path, schema, keys, vcols, tomb, pcols = sides[side]
        op = rng.choice(["mor", "mor", "mor", "merge", "compact",
                         "zorder", "purge", "restore", "vopt"])
        backlog = bool(mor_deltas(spark, path))
        if op == "mor":
            if side == "a":
                aver += 1
                rows = [rand_a(aver) for _ in range(rng.randint(1, 4))]
            else:
                bver += 1
                rows = [rand_b(bver) for _ in range(rng.randint(1, 2))]
            mor_upsert(spark, path, spark.createDataFrame(rows, schema),
                       keys, version_cols=vcols, tombstone_col=tomb)
        elif op == "merge" and not backlog:
            if side == "a":
                aver += 1
                rows = [rand_a(aver)]
            else:
                bver += 1
                rows = [rand_b(bver)]
            merge_upsert(spark, path, spark.createDataFrame(rows, schema),
                         keys, version_cols=vcols, tombstone_col=tomb,
                         partition_by=pcols)
        elif op == "compact":
            compact_small_files(spark, path)
        elif op == "zorder":
            optimize_zorder(spark, path, keys, target_rows_per_file=1000)
        elif op == "purge" and not backlog:
            purge_tombstones(spark, path, tomb, partition_by=pcols)
        elif op == "restore":
            states = (manifest_versions(spark, path) if flavor == "flat"
                      else partitioned_manifest_generations(spark, path))
            restore_manifest_table(spark, path, rng.choice(states))
        elif op == "vopt":
            optimize_agg_view(spark, view,
                              purge_dead=rng.random() < 0.5)
        refresh_join_view(spark, view)
        assert _got_mm(spark, view) == _expected_mm(spark, a, b_path), (
            flavor, step, side, op,
        )


def test_randomized_model_parity(spark, tmpdir):
    """Seeded random program over BOTH sides — upserts, deletes, group
    moves, join-key moves, compactions (either side), view optimize —
    with view == direct join GROUP BY after every refresh."""
    from async_pipes_spark.sources.ivm import optimize_agg_view

    rng = random.Random(0x301)
    a, b = _mk(spark, tmpdir, n_a=25, n_b=8)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], AGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    aver = bver = 0
    for step in range(8):
        if rng.random() < 0.8:
            aver += 1
            rows = []
            for _ in range(rng.randint(1, 4)):
                rows.append((
                    rng.randint(0, 30),
                    rng.choice([None] + list(range(11))),
                    rng.choice([None, rng.randint(-500, 500)]),
                    aver, rng.random() < 0.2,
                ))
            _up_a(spark, a, rows)
        if rng.random() < 0.5:
            bver += 1
            rows = []
            for _ in range(rng.randint(1, 2)):
                rows.append((
                    rng.randint(0, 102),
                    rng.choice([None] + list(range(11))),
                    rng.randint(0, 3), bver, rng.random() < 0.2,
                ))
            _up_b(spark, b, rows)
        if rng.random() < 0.2:
            compact_small_files(spark, rng.choice([a, b]))
        if rng.random() < 0.2:
            optimize_agg_view(spark, view,
                              purge_dead=rng.random() < 0.5)
        refresh_join_view(spark, view)
        assert _got(spark, view) == _expected(spark, a, b), step


def test_join_catchup_past_broadcast_gate(spark, tmpdir, monkeypatch):
    """The 100 TB catch-up shape for JOIN views: gate forced to 0
    bytes, so every slice (key probes, affected view rows, companion
    slices, needy sets, recompute prunes) must run as plain shuffle
    joins — no isin inline (spy pins inline=None), and neither
    refresher module may even ASK for a broadcast hint — while the
    min/max + count_distinct + algebraic lanes still land
    value-exact."""
    from pyspark.sql import functions as RF

    import async_pipes_spark.sources.ivm as ivm_mod
    import async_pipes_spark.sources.ivm_join as ivj

    a, b = _mk(spark, tmpdir)
    view = f"{tmpdir}/v"
    create_join_view(spark, a, b, view, ["jk"], ["g"], MMAGGS,
                     left_tombstone_col="adead", right_tombstone_col="bdead")
    monkeypatch.setattr(ivj, "_MOR_BROADCAST_MAX_BYTES", -1)
    probes = []
    real_probe = ivj._keys_probe

    def spy(spark_, signed, join_keys, small, feed_pinned=False):
        assert not small, "window must read as big past the gate"
        keys, inline = real_probe(spark_, signed, join_keys, small,
                                  feed_pinned=feed_pinned)
        probes.append(inline)
        return keys, inline

    monkeypatch.setattr(ivj, "_keys_probe", spy)

    class NoBroadcastF:
        def __getattr__(self, name):
            if name == "broadcast":
                raise AssertionError(
                    "join refresher requested a broadcast hint past the gate"
                )
            return getattr(RF, name)

    monkeypatch.setattr(ivj, "F", NoBroadcastF())
    monkeypatch.setattr(ivm_mod, "F", NoBroadcastF())  # _dv_fold's module
    # both sides move: extreme-holder updates (needy lane), value
    # collapses (companion lane), dim death + rename (join moves)
    _up_a(spark, a, [(11, 1, 3, 1, False), (17, 7, 4, 1, False),
                     (2, 2, 20, 1, False), (12, 2, 20, 1, False)])
    _up_b(spark, b, [(3, 3, 0, 1, True), (5, 5, 1, 1, False)])
    s = refresh_join_view(spark, view)
    assert s["mode"] == "incremental" and s["deltas_consumed"] == 2, s
    assert s["minmax_recompute"], s
    assert probes and all(p is None for p in probes), probes
    assert _got_mm(spark, view) == _expected_mm(spark, a, b)


def test_in_expr_matches_isin(spark):
    """r12: ``_in_expr`` (one parsed SQL string, one py4j round-trip)
    must filter exactly like ``Column.isin`` (one round-trip per key)
    for every key type the engine inlines — ints and strings
    including quotes/backslashes — and must FALL BACK to ``isin``
    for anything else (dates here), never mis-render a literal."""
    import datetime

    from async_pipes_spark.sources.ivm_join import _in_expr

    rows = [(1, "a"), (2, "it's"), (3, "back\\slash"), (4, None), (None, "z")]
    df = spark.createDataFrame(rows, "k bigint, s string")
    for col, vals, n_want in [
        ("k", [1, 3], 2),
        ("k", [2], 1),
        ("s", ["it's", "back\\slash"], 2),
        ("s", ["nope"], 0),
    ]:
        got = sorted(map(tuple, df.where(_in_expr(col, vals)).collect()))
        want = sorted(map(tuple, df.where(F.col(col).isin(vals)).collect()))
        assert got == want and len(got) == n_want, (col, vals, got, want)
    # empty key set: no row survives (isin([])'s filter semantics)
    assert df.where(_in_expr("k", [])).count() == 0
    # fallback lane (non-int/str values): same rows as isin
    ddf = spark.createDataFrame(
        [(datetime.date(2024, 1, 1),), (datetime.date(2024, 1, 2),)], "d date"
    )
    vals = [datetime.date(2024, 1, 1)]
    assert (
        ddf.where(_in_expr("d", vals)).collect()
        == ddf.where(F.col("d").isin(vals)).collect()
    )
