"""Oracle tests for the extension query set (dedup / similarity /
text analysis / multimodal) plus unit tests for the operators that
aren't SQL-expressible (async map, langid discrimination, media
error paths)."""

import pytest
from pyspark.sql import functions as F

from async_pipes_spark.plans.extensions import EXTENSION_ORACLES, EXTENSION_QUERIES

from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_every_extension_query_has_an_oracle():
    assert set(EXTENSION_QUERIES) == set(EXTENSION_ORACLES)


@pytest.mark.parametrize("name", sorted(EXTENSION_QUERIES))
def test_extension_query_matches_oracle(spark, duck, name):
    df = EXTENSION_QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, EXTENSION_ORACLES[name], name=name)


def test_langid_discriminates_real_text(spark):
    """The stopword-profile heuristic must actually identify language
    on natural snippets (synthetic corpus shares one vocabulary, so
    this is where discrimination is proven)."""
    from async_pipes_spark.functions.text import langid_scores

    rows = [
        (1, "the cat sat on the mat and it was happy to be in the sun"),
        (2, "der hund ist nicht zu haus und die katze ist mit den kindern"),
        (3, "le chat est dans la maison et les enfants sont pour une promenade"),
        (4, "el perro es un animal y los gatos son una compania que por siempre"),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r.doc_id: r.pred_lang for r in langid_scores(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_async_map_bounded_concurrency(spark):
    """async_map_in_pandas: transform + drop semantics, and in-flight
    concurrency never exceeds max_task_count (the reference's
    admission-control contract, workers.rs:139)."""
    import asyncio

    from async_pipes_spark.operators.async_map import async_map_in_pandas

    df = spark.range(0, 40, 1, 1).select(F.col("id").cast("bigint").alias("id"))

    def make_work():
        # state lives in the Python worker process; surfaced per-row
        state = {"in_flight": 0, "max_seen": 0}

        async def work(rec):
            state["in_flight"] += 1
            state["max_seen"] = max(state["max_seen"], state["in_flight"])
            await asyncio.sleep(0.005)
            state["in_flight"] -= 1
            if rec["id"] % 4 == 0:
                return None  # drop (reference map+filter fusion)
            return {"id": rec["id"], "doubled": rec["id"] * 2, "peak": state["max_seen"]}

        return work

    out = async_map_in_pandas(
        df, make_work(), "id bigint, doubled bigint, peak bigint", max_task_count=5
    )
    rows = sorted((r.id, r.doubled, r.peak) for r in out.collect())
    assert len(rows) == 30
    assert all(d == i * 2 for i, d, _ in rows)
    peak = max(p for _, _, p in rows)
    assert 2 <= peak <= 5, peak  # actually concurrent, never above the bound

    # max_task_count=1 must serialize completely
    out1 = async_map_in_pandas(
        df, make_work(), "id bigint, doubled bigint, peak bigint", max_task_count=1
    )
    assert max(r.peak for r in out1.collect()) == 1


def test_async_map_rejects_zero_concurrency(spark):
    from async_pipes_spark.operators.async_map import async_map_in_pandas

    async def noop(rec):
        return rec

    with pytest.raises(ValueError, match="max task count"):
        async_map_in_pandas(spark.range(1), noop, "id bigint", max_task_count=0)


def test_media_codec_stub_raises_for_real_codecs(spark):
    """Non-'raw' media types are explicitly unimplemented here; the
    plumbing must surface that, not fake it."""
    from pyspark.errors.exceptions.captured import PythonException

    from async_pipes_spark.multimodal.binary import extract_features, to_media

    df = spark.createDataFrame([(1, b"\x89PNG", "s")], "doc_id: bigint, payload: binary, source: string")
    media = to_media(df, "payload", "image/png", "source")
    with pytest.raises(PythonException, match="codec for media_type"):
        extract_features(media).collect()


def test_media_resize_crops_and_pads(spark):
    """resize keeps the media struct shape; raw payloads are cropped or
    zero-padded to exactly width*height bytes."""
    from async_pipes_spark.multimodal.binary import resize, to_media

    df = spark.createDataFrame(
        [(1, b"abcdefgh", "s"), (2, b"xy", "s")],
        "doc_id: bigint, payload: binary, source: string",
    )
    out = resize(to_media(df, "payload", "raw", "source"), width=2, height=2)
    rows = {r.doc_id: r for r in out.collect()}
    assert bytes(rows[1].media.payload) == b"abcd"  # cropped
    assert bytes(rows[2].media.payload) == b"xy\0\0"  # padded
    assert all((r.width, r.height) == (2, 2) for r in rows.values())
    assert rows[1].media.media_type == "raw"

def test_json_get_int_matches_general_parser(spark):
    """The regex fast lane must agree with get_json_object on every
    shape: flat single-key (fast lane), nested / multi-key / string /
    whitespace variants / malformed (slow lane), missing key (NULL)."""
    from async_pipes_spark.functions.json import json_get_int

    rows = [
        (1, '{"k": 42}'),
        (2, '{"k": -7}'),
        (3, '{"k": 1, "j": 2}'),
        (4, '{ "k" : 3 }'),
        (5, '{"k": {"nested": 9}}'),
        (6, '{"k": "12"}'),
        (7, '{"j": 5}'),
        (8, 'not json'),
        (9, None),
        (10, '{"k": 3.5}'),
        (11, '{"k": 9999999999}'),
        (12, '{"k": 007}'),  # leading zeros = malformed JSON → NULL
        (13, '{"k": -0}'),
        (14, '{"k": 0}'),
    ]
    df = spark.createDataFrame(rows, "id: bigint, props: string")
    got = df.select(
        "id",
        json_get_int("props", "k").alias("fast"),
        F.get_json_object("props", "$.k").try_cast("int").alias("ref"),
    ).collect()
    for r in got:
        assert r.fast == r.ref, f"id={r.id}: fast={r.fast} ref={r.ref}"


def test_bmp_codec_roundtrip_and_validation():
    """bmp_encode output survives the real parser (incl. odd widths
    that need row padding); malformed inputs are rejected."""
    import pytest as _pytest

    from async_pipes_spark.multimodal.binary import _decode_bmp, bmp_encode

    for w, h, px in [(1, 1, 0), (5, 2, 17), (16, 3, 255), (7, 4, 128)]:
        d = _decode_bmp(bmp_encode(w, h, px))
        assert (d["width"], d["height"]) == (w, h)
        assert d["mean_px_milli"] == px * 1000
        stride = (3 * w + 3) // 4 * 4
        assert d["n_bytes"] == 54 + stride * h
    with _pytest.raises(ValueError):
        _decode_bmp(b"NOTABMP" + b"\0" * 60)
    with _pytest.raises(ValueError):
        _decode_bmp(bmp_encode(4, 4, 9)[:40])  # truncated


def test_winnow_forms_agree(spark):
    """Expression form (interpreted HOF) and Arrow-kernel form must be
    bit-identical, including docs shorter than the window."""
    from async_pipes_spark.functions.text import winnow_fingerprint, winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "tiny"), (3, "the quick brown fox jumped")],
        "doc_id: bigint, text: string",
    )
    expr = {r.doc_id: r.wfp for r in df.select("doc_id", winnow_fingerprint("text").alias("wfp")).collect()}
    kern = {r.doc_id: r.wfp for r in winnow_fingerprints(df).collect()}
    assert expr == kern


def test_async_map_empty_batch_with_nested_schema(spark):
    """The all-dropped-batch fallback frame must honor nested generic
    DDL (comma inside array<struct<..>>) — naive comma-splitting
    produced phantom columns."""
    from async_pipes_spark.operators.async_map import async_map_in_pandas

    async def drop_all(rec):
        return None

    out = async_map_in_pandas(
        spark.range(5).selectExpr("id as n").coalesce(1),
        drop_all,
        "pairs array<struct<x:int,y:int>>",
    )
    assert out.count() == 0
    assert out.columns == ["pairs"]


def test_bpe_learns_hand_computed_merges(spark):
    """learn_bpe_merges on a tiny corpus with hand-derivable answers,
    including the two-pass replace edge: ' a a a a ' must fully merge
    to ' aa aa ' in one iteration (pass 1 alone leaves ' aa a a ' —
    the boundary space of the first match hides the second)."""
    from async_pipes_spark.functions.bpe import learn_bpe_merges

    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "abc")], "doc_id bigint, text string"
    )
    got = [tuple(r) for r in learn_bpe_merges(docs, 2).collect()]
    assert got == [(1, "a", "b", "ab", 4), (2, "ab", "c", "abc", 1)]

    runs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id bigint, text string")
    got = [tuple(r) for r in learn_bpe_merges(runs, 2).collect()]
    # iter1: (a,a) appears 3x per word occurrence * 2 = 6; both words
    # collapse to ' aa aa ' only if BOTH replace passes run
    assert got == [(1, "a", "a", "aa", 6), (2, "aa", "aa", "aaaa", 2)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        learn_bpe_merges(docs, 0)


def test_bpe_oracle_survives_merge_exhaustion(spark):
    """A corpus with fewer than k possible merges: the engine stops
    early and still tokenizes; the encode oracle must NOT annihilate
    its vocab through an empty best{i} (LEFT JOIN, not CROSS JOIN)."""
    import duckdb

    from async_pipes_spark.functions.bpe import (
        bpe_encode_oracle_sql,
        bpe_oracle_sql,
        tokenized_lengths,
    )

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "ab")], "doc_id bigint, text string"
    )
    got = sorted(tuple(r) for r in tokenized_lengths(docs, 3).collect())
    assert got == [(1, 1, 1), (2, 1, 1)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES (1, 'ab'), (2, 'ab'))"
        " t(doc_id, text)"
    )
    assert con.execute(bpe_encode_oracle_sql(3)).fetchall() == [(1, 1, 1), (2, 1, 1)]
    # merge table itself also agrees: only 1 learnable merge
    assert con.execute(bpe_oracle_sql(3)).fetchall() == [(1, "a", "b", "ab", 2)]


def test_triangle_counts_hand_graph(spark):
    """triangle_counts on a hand-checkable graph: K4 minus one edge has
    two triangles sharing an edge; direction/duplicate/self-loop noise
    must not change the counts; a path node counts zero."""
    from async_pipes_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),       # triangle 123
            (2, 4), (4, 3),               # triangle 234 (shares 2-3)
            (3, 2),                       # reverse duplicate
            (4, 4),                       # self loop (ignored)
            (4, 5),                       # pendant: 5 in no triangle
        ],
        "src bigint, dst bigint",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1, 5: 0}


def test_redact_label_with_metacharacters(spark):
    """A redaction label containing '$' or '\\' must not be treated as
    a Matcher group reference in the replacement."""
    from async_pipes_spark.functions.text import redact

    df = spark.createDataFrame([(1, "price 123456 end")], "id bigint, text string")
    out = redact(df, "text", {"us$": "[0-9]{6,}"}).collect()[0]
    assert out.redacted == "price [US$] end"
    assert out["n_us$"] == 1


def test_dq_audit_dotted_check_name(spark):
    """Check names containing '.' must resolve as flat columns, and
    backticked names are rejected up front."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from async_pipes_spark.functions.validate import dq_audit

    df = spark.createDataFrame([(1, 5.0), (2, -1.0)], "id bigint, price double")
    got = {r["check"]: r.n_violations for r in dq_audit(
        df, checks={"price.positive": F.col("price") <= 0}
    ).collect()}
    assert got == {"price.positive": 1}
    with _pytest.raises(ValueError, match="backtick"):
        dq_audit(df, checks={"a`b": F.col("price") <= 0})


def test_simhash_pairs_rejects_radius_exceeding_bits(spark):
    import pytest as _pytest

    from async_pipes_spark.functions.dedup import simhash, simhash_pairs

    docs = spark.createDataFrame([(1, "a b"), (2, "a c")], "doc_id bigint, text string")
    sigs = simhash(docs, bits=16)
    with _pytest.raises(ValueError, match="exceeds signature bits"):
        simhash_pairs(sigs, radius=20, bits=16)


def test_resample_quarter_unit_and_alias_rejection(spark):
    """'quarter' steps as 3 months; date_trunc shorthand aliases are
    rejected instead of producing a broken interval."""
    import datetime

    import pytest as _pytest
    from pyspark.sql import functions as F

    from async_pipes_spark.operators.resample import resample_ffill

    rows = [
        (1, datetime.datetime(2024, 1, 15), 10),
        (1, datetime.datetime(2024, 7, 2), 30),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, v bigint")
    out = resample_ffill(
        df, ts_col="ts", key_col="user_id",
        agg_cols={"total": F.sum("v")}, fill_cols=["total"], unit="quarter",
    ).collect()
    # Q1 observed, Q2 gap-filled (carried 10), Q3 observed
    assert [(r.bucket.month, r.total) for r in sorted(out, key=lambda r: r.bucket)] == [
        (1, 10), (4, 10), (7, 30),
    ]
    with _pytest.raises(ValueError, match="unit must be one of"):
        resample_ffill(
            df, ts_col="ts", key_col="user_id",
            agg_cols={"total": F.sum("v")}, fill_cols=["total"], unit="dd",
        )


def test_ntile_closed_form_matches_spark_ntile(spark):
    """t13's arithmetic bin assignment must reproduce ntile(4) EXACTLY
    for every corpus size shape: rem = 0, rem > 0, and N < buckets
    (where floor(N/4) = 0 and the closed form's ELSE branch must stay
    unreachable). One job: each N is a window partition."""
    sizes = [1, 2, 3, 4, 5, 7, 8, 11, 103, 500]
    rows = [(n, r) for n in sizes for r in range(1, n + 1)]
    df = spark.createDataFrame(rows, "grp bigint, rank bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("rank")
    got = (
        df.withColumn("want", F.ntile(4).over(w).cast("bigint"))
        .selectExpr(
            "grp",
            "rank",
            "want",
            "CASE WHEN rank <= (grp % 4) * ((grp div 4) + 1) "
            "THEN (rank - 1) div ((grp div 4) + 1) + 1 "
            "ELSE (grp % 4) + (rank - 1 - (grp % 4) * ((grp div 4) + 1))"
            " div greatest(grp div 4, 1) + 1 END AS formula",
        )
        .filter("formula <> want")
        .count()
    )
    assert got == 0


def test_reliable_checkpoint_opt_in(spark, tmp_path):
    """enable_reliable_checkpoints flips every engine iteration loop
    from localCheckpoint to reliable checkpoint(): the loop still
    converges to the same result AND its per-round state lands in the
    configured directory (what survives an executor loss)."""
    from pathlib import Path

    from async_pipes_spark.operators.iterate import iterate
    from async_pipes_spark.session import (
        disable_reliable_checkpoints,
        enable_reliable_checkpoints,
    )

    ckdir = tmp_path / "ck"
    enable_reliable_checkpoints(spark, str(ckdir))
    try:
        start = spark.createDataFrame([(1,)], "n bigint")
        out = iterate(start, lambda f: f.selectExpr("n * 2 AS n").filter("n < 20"))
        assert sorted(r.n for r in out.collect()) == [1, 2, 4, 8, 16]
        assert any(p.is_file() for p in Path(ckdir).rglob("*")), (
            "reliable checkpoint wrote nothing to the configured dir"
        )
    finally:
        disable_reliable_checkpoints(spark)


def test_reliable_checkpoint_inherited_by_cloned_sessions(spark, tmp_path):
    """enable_reliable_checkpoints is process-wide: a session created
    with newSession() (the streaming-query idiom) must also pin
    through reliable checkpoint(), not silently fall back to
    localCheckpoint."""
    from pathlib import Path

    from async_pipes_spark.session import (
        disable_reliable_checkpoints,
        enable_reliable_checkpoints,
        pin,
    )

    ckdir = tmp_path / "ck2"
    enable_reliable_checkpoints(spark, str(ckdir))
    try:
        clone = spark.newSession()
        pinned = pin(clone.createDataFrame([(1,)], "n bigint"))
        assert pinned.count() == 1
        assert any(p.is_file() for p in Path(ckdir).rglob("*")), (
            "cloned session pinned via localCheckpoint — the reliable "
            "opt-in did not propagate"
        )
    finally:
        disable_reliable_checkpoints(spark)


def test_decontaminate_custom_id_col(spark):
    """decontaminate_corpus must work for any id column name (the
    shingle kernel always emits 'doc_id'; the join key must be aliased
    back)."""
    from pyspark.sql import functions as F

    from async_pipes_spark.functions.dedup import decontaminate_corpus

    rows = [
        (1, "bench", "a b c d e f g h"),
        (2, "train", "a b c d e f g h"),   # shares 6 shingles >= 2 -> doomed
        (3, "train", "x y z w v u t s"),   # clean
    ]
    df = spark.createDataFrame(rows, "my_id bigint, grp string, body string")
    out = decontaminate_corpus(
        df, F.col("grp") == "bench", min_shared=2,
        group_col="grp", text_col="body", id_col="my_id",
    ).collect()
    assert [(r.my_id, r.grp) for r in out] == [(3, "train")]


def test_resample_excludes_null_ts_and_guards_names(spark):
    """NULL-ts rows are excluded by contract (not silently folded into
    a dropped NULL bucket); aggregate names colliding with the grid
    keys error up front."""
    import datetime

    import pytest as _pytest

    from async_pipes_spark.operators.resample import resample_ffill

    rows = [
        (1, datetime.datetime(2024, 1, 1), 10),
        (1, None, 99),  # excluded: belongs to no bucket
        (1, datetime.datetime(2024, 1, 3), 30),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, v bigint")
    out = resample_ffill(
        df, ts_col="ts", key_col="user_id",
        agg_cols={"total": F.sum("v")}, fill_cols=["total"], unit="day",
    ).collect()
    assert sorted((r.bucket.day, r.total) for r in out) == [(1, 10), (2, 10), (3, 30)]
    with _pytest.raises(ValueError, match="reserved"):
        resample_ffill(
            df, ts_col="ts", key_col="user_id",
            agg_cols={"bucket": F.sum("v")}, fill_cols=[], unit="day",
        )


def test_null_text_yields_null_metrics_not_garbage(spark):
    """NULL text must surface as NULL metrics/fingerprints — not a
    kernel crash (winnow) and not fabricated scores via the legacy
    size(NULL) = -1 (quality metrics would read ttr = (-1)/(-1) = 1).
    Kernel and expression winnow forms must agree on NULL."""
    from async_pipes_spark.functions.text import (
        quality_metrics,
        winnow_fingerprint,
        winnow_fingerprints,
    )

    df = spark.createDataFrame([(1, None), (2, "ab cd")], "doc_id bigint, text string")
    qm = {r.doc_id: r.ttr_micro for r in quality_metrics(df).collect()}
    assert qm[1] is None and qm[2] is not None
    kf = {r.doc_id: r.wfp for r in winnow_fingerprints(df).collect()}
    ef = {
        r.doc_id: r.wfp
        for r in df.select("doc_id", winnow_fingerprint("text").alias("wfp")).collect()
    }
    assert kf == ef and kf[1] is None and kf[2] is not None


def test_hash_hex_distinguishes_null_positions(spark):
    """concat_ws silently skips NULLs; the sentinel encoding must keep
    ('a', NULL), (NULL, 'a') and ('a', '') as three distinct keys so
    sketches and samplers never conflate them — while a single
    NON-NULL key still hashes as md5(cast(value)) for oracle parity."""
    from async_pipes_spark.functions.sketches import hash_hex

    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("a", "")], "c1 string, c2 string"
    )
    hashes = [r.h for r in df.select(hash_hex("c1", "c2").alias("h")).collect()]
    assert len(set(hashes)) == 3
    import hashlib

    one = spark.createDataFrame([(42,)], "k bigint")
    got = one.select(hash_hex("k").alias("h")).head().h
    assert got == hashlib.md5(b"42").hexdigest()[:12]


def test_count_min_lookup_survives_colliding_item_columns(spark):
    """An items frame carrying its own 'cnt'/'i'/'b' columns (natural
    for a frequency table) must not hit ambiguous-reference errors."""
    from async_pipes_spark.functions.sketches import count_min_build, count_min_lookup

    data = spark.createDataFrame([("x",), ("x",), ("y",)], "tok string")
    sketch = count_min_build(data, ["tok"])
    items = spark.createDataFrame(
        [("x", 99, 1, 2), ("z", 0, 3, 4)], "tok string, cnt bigint, i bigint, b bigint"
    )
    out = {r.tok: r.cms_n for r in count_min_lookup(sketch, items, ["tok"]).collect()}
    assert out["x"] >= 2 and out["z"] >= 0


def test_duplicate_ngram_stats_keeps_caller_id_name(spark):
    from async_pipes_spark.functions.text import duplicate_ngram_stats

    df = spark.createDataFrame(
        [(7, "a b c a b c")], "rid bigint, body string"
    )
    out = duplicate_ngram_stats(df, text_col="body", id_col="rid").collect()
    assert out[0].rid == 7 and out[0].total_ngrams == 4


def test_dq_unique_keys_excludes_null_keys(spark):
    """NULL-key rows are nullness, not duplication: uniqueness counts
    only all-keys-non-null rows against their distinct count."""
    from async_pipes_spark.functions.validate import dq_audit

    df = spark.createDataFrame(
        [(1,), (2,), (2,), (None,), (None,)], "k bigint"
    )
    out = {r.check: r.n_violations for r in dq_audit(
        df,
        checks={"k_null": F.col("k").isNull()},
        unique_keys={"k_unique": ["k"]},
    ).collect()}
    assert out == {"k_null": 2, "k_unique": 1}


def test_triangle_counts_keeps_self_loop_only_node(spark):
    """A node whose only edges are self-loops must still get its
    promised zero row (the node set derives from raw edges, not the
    self-loop-filtered undirected set)."""
    from async_pipes_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 3), (1, 3)], "src bigint, dst bigint"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 0}


def test_branching_producer_validates_round_shape(spark):
    """A round returning the wrong number of values must error
    actionably (a short list used to silently starve trailing pipes),
    and a never-terminating closure must hit the pull cap."""
    import pytest as _pytest

    from async_pipes_spark import Pipeline

    state = {"n": 0}

    def bad_round():
        state["n"] += 1
        return [state["n"]] if state["n"] <= 2 else None  # 1 value, 2 pipes

    b = (
        Pipeline.builder(spark)
        .with_branching_producer(
            ["x", "y"], bad_round, schemas=["v bigint", "v bigint"]
        )
        .with_consumer("x", lambda df: df.count())
        .with_consumer("y", lambda df: df.count())
        .build()
    )
    with _pytest.raises(ValueError, match="every round must provide"):
        b.wait()


def test_dedup_kernels_skip_null_text(spark):
    """NULL-text rows emit nothing from every Arrow dedup kernel
    (shingles/minhash/simhash/jaccard) instead of killing the task with
    an AttributeError; decontaminate routes NULL-predicate rows to
    TRAINING instead of dropping them from both sides."""
    from async_pipes_spark.functions.dedup import (
        decontaminate_corpus,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
        simhash,
    )

    df = spark.createDataFrame(
        [(1, None, None), (2, "a b c d", "train"), (3, "a b c d", "train")],
        "doc_id bigint, text string, source string",
    )
    assert shingles(df).filter("doc_id = 1").count() == 0
    assert minhash_signatures(df).filter("doc_id = 1").count() == 0
    assert simhash(df).filter("doc_id = 1").count() == 0
    assert ngram_jaccard_pairs(df).count() == 1  # the 2-3 pair only
    # NULL source -> NULL predicate -> doc 1 must stay in the corpus
    out = decontaminate_corpus(
        df, F.col("source") == "bench", min_shared=1
    ).collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3]


def test_jaccard_custom_id_col_and_minhash_divisibility(spark):
    import pytest as _pytest

    from async_pipes_spark.functions.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(10, "x y z w"), (11, "x y z w")], "rid bigint, body string"
    )
    pairs = ngram_jaccard_pairs(df, text_col="body", id_col="rid").collect()
    assert [(r.doc_a, r.doc_b, r.jac_micro) for r in pairs] == [(10, 11, 1000000)]
    with _pytest.raises(ValueError, match="divisible"):
        minhash_signatures(df, text_col="body", id_col="rid",
                           num_hashes=10, band_size=4)


def test_boilerplate_scrub_semantics(spark):
    """remove_boilerplate_segments: a segment in > max_docs DISTINCT
    docs vanishes from every doc; reassembly preserves segment order
    around a removed middle segment; an all-boilerplate doc becomes
    ''; NULL text passes through NULL with 0 removed; a segment
    repeated within ONE doc is not boilerplate (distinct-doc count);
    a trailing short segment survives intact."""
    from async_pipes_spark.functions.dedup import remove_boilerplate_segments

    boiler = "x x x x"
    rows = [
        (1, boiler + " a a a a"),
        (2, boiler + " b b b b"),
        (3, boiler),  # all boilerplate -> ''
        (4, "c c c c c c c c"),  # same segment twice in ONE doc: stays
        (5, None),
        (6, "tail seg short"),  # shorter than seg_tokens: one segment
        (7, "a1 a2 a3 a4 " + boiler + " b1 b2 b3 b4"),  # removed middle
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_segments(df, seg_tokens=4, max_docs=2).collect()
    }
    assert len(out) == 7
    assert (out[1].clean_text, out[1].removed_segments) == ("a a a a", 1)
    assert (out[2].clean_text, out[2].removed_segments) == ("b b b b", 1)
    assert (out[3].clean_text, out[3].removed_segments) == ("", 1)
    assert (out[4].clean_text, out[4].removed_segments) == ("c c c c c c c c", 0)
    assert (out[5].clean_text, out[5].removed_segments) == (None, 0)
    assert (out[6].clean_text, out[6].removed_segments) == ("tail seg short", 0)
    assert (out[7].clean_text, out[7].removed_segments) == (
        "a1 a2 a3 a4 b1 b2 b3 b4",
        1,
    )


def test_boilerplate_scrub_custom_id_col(spark):
    """The segment kernel always emits 'doc_id'; the private join-key
    alias must line the output up for ANY caller id column name."""
    from async_pipes_spark.functions.dedup import remove_boilerplate_segments

    rows = [(10, "p q r s"), (20, "p q r s"), (30, "p q r s")]
    df = spark.createDataFrame(rows, "my_id bigint, body string")
    out = sorted(
        (r.my_id, r.clean_text, r.removed_segments)
        for r in remove_boilerplate_segments(
            df, text_col="body", id_col="my_id", seg_tokens=4, max_docs=2
        ).collect()
    )
    assert out == [(10, "", 1), (20, "", 1), (30, "", 1)]


def test_top_bigram_stats_semantics(spark):
    """top_bigram_stats: coverage fraction, deterministic tie-break to
    the lexicographically largest bigram, <2-token docs emit no row."""
    from async_pipes_spark.functions.dedup import DEFAULT_SHINGLE  # noqa: F401
    from async_pipes_spark.functions.text import top_bigram_stats

    rows = [
        (1, "a b a b a b"),   # 'a b' x3, 'b a' x2 -> top 'a b', 6 toks
        (2, "x y z w"),       # all bigrams count 1 -> tie, pick 'z w'
        (3, "solo"),          # 1 token: no row
        (4, None),            # NULL: no row
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in top_bigram_stats(df).collect()}
    assert sorted(out) == [1, 2]
    assert (out[1].n_tokens, out[1].top_bigram, out[1].top_count) == (6, "a b", 3)
    assert out[1].top_frac_micro == 1_000_000  # 2*3/6
    assert (out[2].n_tokens, out[2].top_bigram, out[2].top_count) == (4, "z w", 1)
    assert out[2].top_frac_micro == 500_000  # 2*1/4


def test_split_assign_null_group_matches_oracle_sentinel(spark):
    """smp7/pipe2's oracles sentinel-encode NULL group keys
    (COALESCE(grp, chr(0))) because split_assign hashes NULL through
    _null_safe_key's NUL sentinel — a NULL-group row must land in the
    SAME split on both engines, not fall through the oracle's CASE to
    the last split."""
    import duckdb

    from async_pipes_spark.functions.sampling import _threshold_hex, split_assign

    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id bigint, grp string"
    )
    got = {
        r.doc_id: r.split
        for r in split_assign(
            df, ["grp"], {"train": 800_000, "val": 100_000, "test": 100_000}
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
            SELECT doc_id,
                   CASE WHEN substring(md5(COALESCE(grp, chr(0))), 1, 12)
                             < '{_threshold_hex(800_000)}' THEN 'train'
                        WHEN substring(md5(COALESCE(grp, chr(0))), 1, 12)
                             < '{_threshold_hex(900_000)}' THEN 'val'
                        ELSE 'test' END
            FROM (VALUES (1, NULL), (2, 'a b c')) t(doc_id, grp)
            """
        ).fetchall()
    }
    assert got == want and got[1] == "train"


def test_quantile_sketch_rejects_reserved_column_names(spark):
    """A group column named 'v'/'w' (sketch) or 'v'/'w'/'prob'/'est'
    (merge) would silently clobber the summary's value/weight columns;
    both entry points must reject with a clear error instead."""
    import pytest

    from async_pipes_spark.functions.sketches import quantile_merge, quantile_sketch

    df = spark.createDataFrame([(1, 2.0)], "v bigint, x double")
    with pytest.raises(ValueError, match="reserved"):
        quantile_sketch(df, "x", ["v"])
    with pytest.raises(ValueError, match="reserved"):
        quantile_sketch(
            spark.createDataFrame([(1, 2.0)], "g bigint, w double"), "w", ["g"]
        )
    # a VALUE column named 'v' is allowed — it maps onto the summary's
    # own value column (k5's tests rely on it)
    assert quantile_sketch(
        spark.createDataFrame([(1, 2.0)], "g bigint, v double"), "v", ["g"]
    ).columns == ["g", "v", "w"]
    summ = quantile_sketch(
        spark.createDataFrame([(1, 2.0)], "g bigint, x double"), "x", ["g"]
    ).withColumnRenamed("g", "est")
    with pytest.raises(ValueError, match="reserved"):
        quantile_merge(summ, ["est"], [0.5])


def test_audio_envelope_semantics(spark):
    """audio_envelope: integer frame energies over uint8 samples; a
    payload below one full frame emits NO row; identical loudness
    contours collide on env_fp (the dedup bucket); non-raw media
    raises the honest decoder stub error."""
    import pytest

    from async_pipes_spark.multimodal.binary import audio_envelope, to_media

    rows = [
        (1, bytes([10] * 64)),        # 2 full frames of constant 10
        (2, bytes([10] * 64)),        # identical contour -> same fp
        (3, bytes([10] * 31)),        # under one frame -> no row
        (4, bytes([10] * 32 + [200] * 32)),  # different contour
        (5, None),                    # NULL payload -> no row, no crash
    ]
    media = to_media(
        spark.createDataFrame(rows, "doc_id bigint, payload binary")
        .withColumn("source", F.lit("s")),
        "payload", "raw", "source",
    )
    got = {r.doc_id: (r.n_frames, r.env_fp) for r in audio_envelope(
        media, frame_samples=32, max_frames=8
    ).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1] == got[2] and got[1][0] == 2
    assert got[4][1] != got[1][1]
    bad = to_media(
        spark.createDataFrame([(9, b"x" * 64)], "doc_id bigint, payload binary")
        .withColumn("source", F.lit("s")),
        "payload", "wav", "source",
    )
    with pytest.raises(Exception, match="audio decoder"):
        audio_envelope(bad).collect()


def test_audio_envelope_matches_python_model_on_random_payloads(spark):
    """audio_envelope vs a direct Python model over seeded-random
    payloads of adversarial lengths (0, sub-frame, exact-frame,
    frame±1, many-frame): same rows, same fingerprints, regardless of
    partitioning."""
    import hashlib
    import random

    from async_pipes_spark.multimodal.binary import audio_envelope, to_media

    rng = random.Random(7)
    lens = [0, 1, 31, 32, 33, 63, 64, 65, 255, 256, 257, 400] + [
        rng.randrange(0, 400) for _ in range(38)
    ]
    rows = [
        (i, bytes(rng.randrange(256) for _ in range(n)))
        for i, n in enumerate(lens)
    ]

    def model(payload, frame=32, max_frames=8):
        k = min(len(payload) // frame, max_frames)
        if k == 0:
            return None
        energies = [
            sum(payload[f * frame : (f + 1) * frame]) // frame for f in range(k)
        ]
        return k, hashlib.md5("|".join(map(str, energies)).encode()).hexdigest()

    want = {i: m for i, (p) in [(i, p) for i, p in rows] if (m := model(p))}
    for parts in (1, 7):
        media = to_media(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
            .repartition(parts)
            .withColumn("source", F.lit("s")),
            "payload", "raw", "source",
        )
        got = {
            r.doc_id: (r.n_frames, r.env_fp)
            for r in audio_envelope(media).collect()
        }
        assert got == want
