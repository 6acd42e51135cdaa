"""Physical-plan regression tests: the scale-critical plan properties
(predicate pushdown, column pruning, broadcast joins, top-k without a
full sort) must survive refactors — these are what make the same code
viable at 100 TB."""

import contextlib
import io

from async_pipes_spark.plans.declared import (
    p1_projection,
    p2_filter_fold,
    x2_cosine_top1,
    x6_top_customers,
)

from tests.conftest import SF_SMOKE


def plan_text(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_p2_filter_pushdown_and_pruning(spark):
    txt = plan_text(p2_filter_fold(spark, SF_SMOKE))
    assert "GreaterThan(l_quantity,30.0)" in txt, txt
    assert "GreaterThanOrEqual(l_shipdate" in txt, txt
    # scan reads only the two needed columns of lineitem's 11 (the
    # engine pins TimestampType inference — session.py INFER_NTZ — so
    # the pushed filter and pruned schema are tz-typed)
    assert "struct<l_quantity:double,l_shipdate:timestamp>" in txt, txt


def test_p1_column_pruning(spark):
    txt = plan_text(p1_projection(spark, SF_SMOKE))
    read = [l for l in txt.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read and "l_discount" in read
    assert "l_comment" not in read and "l_shipdate" not in read


def test_x6_broadcast_join_and_topk(spark):
    txt = plan_text(x6_top_customers(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in txt, txt
    # top-10 compiles to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in txt, txt
    assert "partial_sum" not in txt or "Sort " not in txt.split("TakeOrdered")[0]


def test_x2_corpus_side_unshuffled(spark):
    # the query block is closed over by the Arrow kernel; the corpus
    # scan must feed MapInPandas directly — no join, no Exchange below it
    txt = plan_text(x2_cosine_top1(spark, SF_SMOKE), mode="simple")
    assert "MapInPandas" in txt, txt
    below_kernel = txt.split("MapInPandas")[-1]
    assert "Exchange" not in below_kernel, txt
    assert "Join" not in txt, txt


def test_temporal_joins_avoid_cartesian(spark):
    """j1/j2 must never plan a cartesian/broadcast-nested-loop product:
    the as-of join is a window over a union (no join node at all); the
    range join is an equi-join on (key, bucket)."""
    from async_pipes_spark.plans.joins import j1_asof_attribution, j2_range_attribution

    asof_txt = plan_text(j1_asof_attribution(spark, SF_SMOKE), mode="simple")
    assert "CartesianProduct" not in asof_txt, asof_txt
    assert "BroadcastNestedLoopJoin" not in asof_txt, asof_txt
    assert "Window" in asof_txt, asof_txt

    range_txt = plan_text(j2_range_attribution(spark, SF_SMOKE), mode="simple")
    assert "CartesianProduct" not in range_txt, range_txt
    assert "BroadcastNestedLoopJoin" not in range_txt, range_txt
    # the bucket equi-join appears as a hash or sort-merge join
    assert "Join" in range_txt, range_txt


def test_j3_star_join_broadcasts_and_preaggregates(spark):
    """The Q5-shaped star join must broadcast every dimension at this
    scale (no sort-merge join) and aggregate orders BEFORE joining —
    the join moves one row per customer, never one per order."""
    from async_pipes_spark.plans.joins import j3_revenue_by_nation

    txt = plan_text(j3_revenue_by_nation(spark, SF_SMOKE), mode="simple")
    assert txt.count("BroadcastHashJoin") >= 3, txt
    assert "SortMergeJoin" not in txt, txt
    # pre-aggregation: the per-custkey HashAggregate sits below the
    # customer join (inside its build side), not above it
    below_top_join = txt.split("BroadcastHashJoin", 1)[1]
    assert "HashAggregate(keys=[o_custkey" in below_top_join, txt


def test_d2_lsh_has_no_join(spark):
    """LSH candidate pairs come from in-bucket expansion, not a
    self-join — a join here would evaluate the signature kernel twice
    (once per side) and double the shuffle."""
    from async_pipes_spark.plans.extensions import EXTENSION_QUERIES

    txt = plan_text(EXTENSION_QUERIES["d2_minhash_lsh_pairs"](spark, SF_SMOKE), mode="simple")
    # clean corpus → the hot-bucket side-job finds nothing and the MAIN
    # plan is exactly the uncapped single-kernel shape: no join of any
    # kind, signature kernel evaluated once in the plan
    assert "Join" not in txt, txt
    assert txt.count("MapInPandas") == 1, txt


def test_a2_ivf_is_fused_single_pass(spark):
    """ivf_topk must be the fused kernel shape: one MapInPandas over
    the corpus, NO grouped-map (FlatMapGroupsInPandas) that would
    funnel a whole cell into one task, and the only Exchange is the
    final per-query ranking window over the tiny sims set."""
    from async_pipes_spark.plans.extensions import EXTENSION_QUERIES

    txt = plan_text(EXTENSION_QUERIES["a2_ivf_top1"](spark, SF_SMOKE), mode="simple")
    assert "FlatMapGroupsInPandas" not in txt, txt
    assert txt.count("MapInPandas") == 1, txt
    assert txt.count("Exchange") == 1, txt


def test_d6_contamination_plan_shape(spark):
    """Contamination check: candidate generation must stay a hash
    join on shingle (never a nested-loop/cartesian pairing of
    sources) with map-side partial aggregation before each shuffle,
    and the self-join's shared distinct subtree must be deduped by
    exchange reuse — the shingle kernel executes once."""
    from async_pipes_spark.plans.extensions import d6_contamination

    df = d6_contamination(spark, SF_SMOKE)
    df.collect()  # let AQE finalize so reuse shows in the plan
    txt = plan_text(df, "formatted")
    assert "CartesianProduct" not in txt and "BroadcastNestedLoop" not in txt, txt
    assert "partial_count" in txt or "Partial" in txt, txt
    assert "ReusedExchange" in txt, txt


def test_t6_repetition_plan_shape(spark):
    """Repetition signal: one aggregation keyed on doc_id, no joins at
    all — the kernel explode feeds a straight groupBy."""
    from async_pipes_spark.plans.extensions import t6_repetition

    txt = plan_text(t6_repetition(spark, SF_SMOKE), "formatted")
    assert "Join" not in txt, txt
    assert "CartesianProduct" not in txt, txt


def test_t7_bigram_lm_plan_single_kernel_pass(spark):
    """t7: the bigram kernel feeds both the LM and the scoring join
    through ONE deduped stage — the final adaptive plan must contain
    exactly one MapInPandas with a ReusedExchange covering the second
    consumer, and no cartesian shapes. (The vacuous isnotnull filter in
    bigram_lm_scores is what keeps both consumer subtrees identical —
    this test pins that.)"""
    from async_pipes_spark.plans.extensions import t7_bigram_lm

    df = t7_bigram_lm(spark, SF_SMOKE)
    df.collect()  # let AQE finalize so stage reuse shows in the plan
    final = plan_text(df, "formatted").split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 1, final
    assert "ReusedExchange" in final, final
    assert "CartesianProduct" not in final and "BroadcastNestedLoop" not in final


def test_t8_redact_plan_stays_in_codegen(spark):
    """t8: regexp scrub is pure JVM codegen over the scan — no Python
    nodes, no joins, no aggregates; the only exchange is the output
    sort."""
    from async_pipes_spark.plans.extensions import t8_redact

    txt = plan_text(t8_redact(spark, SF_SMOKE), "formatted")
    assert "MapInPandas" not in txt and "EvalPython" not in txt, txt
    assert "Join" not in txt, txt
    # column pruning reaches the scan: only the two consumed columns
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in txt, txt
    # exactly one exchange — the output sort; the scrub itself is
    # a Project sitting directly on the scan
    assert txt.count("(3) Exchange") >= 1 and "rangepartitioning" in txt, txt


def test_t12_topk_terms_uses_window_group_limit(spark):
    """t12: the per-doc rank-3 cutoff must apply BELOW the window
    exchange (WindowGroupLimit partial pushdown, the r7/smp3 shape) —
    only ~3 rows per doc per input partition shuffle, not every
    (doc, term, score) row."""
    from async_pipes_spark.plans.extensions import t12_tfidf_top_terms

    txt = plan_text(t12_tfidf_top_terms(spark, SF_SMOKE), "formatted")
    assert "WindowGroupLimit" in txt, txt


def test_pipe1_quality_gate_pushes_into_scan(spark):
    """pipe1: the curation pipeline's length gate must reach the
    parquet scan (PushedFilters), not run above the dedup shuffle —
    at 100 TB this is the difference between scanning the gated subset
    and the whole corpus."""
    from async_pipes_spark.plans.extensions import pipe1_curation_pipeline

    txt = plan_text(pipe1_curation_pipeline(spark, SF_SMOKE), "formatted")
    assert "GreaterThanOrEqual(n_chars,50)" in txt, txt
    # one corpus-wide shuffle for the dedup window; the mixture filter
    # itself adds no shuffle of document payloads
    assert "CartesianProduct" not in txt, txt


def test_pipe2_gate_pushdown_and_broadcast_scrub(spark):
    """pipe2: the quality gate must reach every documents scan
    (PushedFilters — the decontamination kernels and the dedup window
    all read the GATED subset, not the corpus), the contaminated-id
    removal must be a broadcast LeftAnti (payloads never shuffle for
    the scrub), and nothing may go cartesian."""
    from async_pipes_spark.plans.extensions import pipe2_training_prep

    txt = plan_text(pipe2_training_prep(spark, SF_SMOKE), "formatted")
    assert "GreaterThanOrEqual(n_chars,50)" in txt, txt
    assert "BroadcastHashJoin LeftAnti BuildRight" in txt, txt
    assert "CartesianProduct" not in txt, txt


def test_d10_survivor_removal_is_broadcast_anti_join(spark):
    """d10: the doomed-id set is dup-cluster-sized, so corpus removal
    must be a broadcast LeftAnti — corpus payloads never shuffle for
    the join."""
    from async_pipes_spark.plans.extensions import d10_dedup_survivors

    txt = plan_text(d10_dedup_survivors(spark, SF_SMOKE), "formatted")
    assert "BroadcastHashJoin LeftAnti BuildRight" in txt, txt


def test_t13_bins_have_no_global_window(spark):
    """t13: curriculum binning must NOT run the corpus through a
    single-partition ntile window — ranks come from the distributed
    prefix scan, whose only window is partitioned by the range-
    partition id. The whole-corpus-through-one-task funnel is the
    classic 100 TB killer this pin guards against."""
    from async_pipes_spark.plans.extensions import t13_curriculum_bins

    txt = plan_text(t13_curriculum_bins(spark, SF_SMOKE), "formatted")
    assert "ntile" not in txt, txt
    # every windowspec is keyed by the scan's _pid partition column
    specs = [l for l in txt.splitlines() if "windowspecdefinition(" in l]
    assert specs, txt
    for line in specs:
        assert "_pid" in line, line


def test_split_assign_is_shuffle_free_projection(spark):
    """split_assign: the train/val/test assignment itself must plan as
    a pure map-side projection — zero Exchange, zero join, zero
    aggregate. At 100 TB the split is free; anything else means the
    assignment accidentally grew a stats pass."""
    from async_pipes_spark.functions.sampling import split_assign

    df = spark.range(1000).selectExpr("id AS doc_id", "id % 7 AS grp")
    txt = plan_text(
        split_assign(df, ["grp"], {"train": 900_000, "test": 100_000}),
        "formatted",
    )
    assert "Exchange" not in txt, txt
    assert "Join" not in txt, txt
    assert "Aggregate" not in txt, txt


def test_bpe2_encode_is_broadcast_vocab_join(spark):
    """bpe2: encoding joins the corpus against the once-segmented
    vocab via broadcast — the corpus side must not shuffle."""
    from async_pipes_spark.plans.extensions import bpe2_tokenize_corpus

    txt = plan_text(bpe2_tokenize_corpus(spark, SF_SMOKE), "formatted")
    assert "BroadcastHashJoin" in txt, txt


def test_a6_knn_join_plan_shape(spark):
    """a6: the k-NN join's final adaptive plan runs ONE cogrouped
    kernel (tile top-k), with no cartesian shapes — the cell key is
    the only meeting point of the two sides."""
    from async_pipes_spark.plans.extensions import a6_knn_join

    df = a6_knn_join(spark, SF_SMOKE)
    df.collect()  # let AQE finalize
    final = plan_text(df, "formatted").split("== Initial Plan ==")[0]
    assert final.count("FlatMapCoGroupsInPandas") == 1, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoop" not in final, final


def test_a8_ivfpq_plan_shape(spark):
    """a8: the composed IVFPQ retrieval must meet the corpus only
    through Arrow kernels and a BROADCAST re-rank join — no cartesian
    shapes anywhere, and the ADC scan's kernel input is the encoded
    index (vec_id, cell, codes), never the raw vectors."""
    from async_pipes_spark.functions.similarity import (
        ivf_pq_topk,
        pq_codebooks,
    )
    from async_pipes_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_codebooks(emb, m=8, k=16)
    df = ivf_pq_topk(emb, queries, k=3, codebooks=books, shortlist=10, nprobe=2)
    txt = plan_text(df, "formatted")
    assert "CartesianProduct" not in txt, txt
    assert "BroadcastNestedLoop" not in txt, txt
    # the shortlist joins back to raw vectors via broadcast (the
    # corpus scan side must not shuffle for the re-rank)
    assert "BroadcastHashJoin" in txt, txt


def test_f1_fuzzy_join_windows_are_per_string(spark):
    """f1: the prefix-gram selection's only windows partition by a
    string id (bounded rows per key) — never an unpartitioned global
    window; and the blocking must not degrade to a nested-loop plan.
    (Inspects the operator pre-pin — the query's final localCheckpoint
    truncates lineage, hiding the interesting plan.)"""
    from async_pipes_spark.functions.fuzzy import fuzzy_pairs
    from async_pipes_spark.sources.tables import load_table

    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    txt = plan_text(fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1), "formatted")
    assert "CartesianProduct" not in txt and "BroadcastNestedLoop" not in txt
    specs = [l for l in txt.splitlines() if "windowspecdefinition(" in l]
    assert specs, txt
    for line in specs:
        assert "l_id" in line or "r_id" in line, line


def test_r18_bucketed_join_is_exchange_free(spark):
    """r18: both sides bucketed on the join key → the SortMergeJoin
    AND the per-order aggregation consume the scans' reported hash
    partitioning — the executed plan has ZERO Exchange and both scans
    read as bucketed. This is the shuffle-once-at-ingest contract the
    bucketed layout exists for."""
    import tempfile

    from pyspark.sql import functions as F

    from async_pipes_spark.functions.money import cents
    from async_pipes_spark.plans.relational import r18_joined_plan
    from async_pipes_spark.session import ensure_engine_confs
    from async_pipes_spark.sources.sinks import write_bucketed_table
    from async_pipes_spark.sources.tables import load_table

    session = spark.newSession()
    ensure_engine_confs(session)
    session.conf.set("spark.sql.shuffle.partitions", "8")
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    base = tempfile.mkdtemp(prefix="r18_plan_")
    li = load_table(session, SF_SMOKE, "lineitem").select(
        "l_orderkey", cents("l_extendedprice").alias("price_cents")
    )
    orders = load_table(session, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed_table(
        li.repartition(8, "l_orderkey"), "r18_lineitem_b", ["l_orderkey"],
        8, sort_cols=["l_orderkey"], path=f"{base}/li",
    )
    write_bucketed_table(
        orders.repartition(8, "o_orderkey"), "r18_orders_b", ["o_orderkey"],
        8, sort_cols=["o_orderkey"], path=f"{base}/orders",
    )
    try:
        df = r18_joined_plan(session)
        df.collect()  # let AQE finalize
        txt = df._jdf.queryExecution().executedPlan().toString()
        final = txt.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final, final
        assert "Exchange" not in final, final
        assert final.count("Bucketed: true") == 2, final
    finally:
        session.sql("DROP TABLE IF EXISTS r18_lineitem_b")
        session.sql("DROP TABLE IF EXISTS r18_orders_b")
        import shutil

        shutil.rmtree(base, ignore_errors=True)
