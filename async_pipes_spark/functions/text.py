"""Text-analysis operators for large-scale document pipelines.

All hot-path computation is JVM-side (split/regexp/array functions
inside whole-stage codegen) — no Python UDFs — so these run at scan
speed on a 1000-executor cluster.

Canonicalization: ratio outputs use integer micro-units
(functions.vectors.micro_units) so DuckDB oracles hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from async_pipes_spark.functions.vectors import micro_units

#: BPE-ish word/punctuation token pattern: runs of word chars OR single
#: non-word non-space chars (an approximation of byte-pair pre-tokenizers).
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

#: Tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic. Deliberately small and public-knowledge.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "zu", "den", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
}


def ws_tokens(text: Column | str) -> Column:
    """Whitespace (single-space) tokenization as an array column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ", -1)


def token_count_ws(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct token
    set — detects reorderings/duplications of the same vocabulary
    (the classic "word sort" near-dup canonicalization)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws_tokens(text))), " "))


def winnow_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Rolling-window document fingerprint (the winnowing idea with a
    global min: hash every ``window``-char substring, keep the
    lexicographic minimum). Shared substrings between near-identical
    docs produce identical minima with high probability, so equal
    fingerprints flag copy-with-small-edits pairs — the character-level
    complement of the token-set :func:`fingerprint`.

    Expression form (sequence → transform(md5 ∘ substring) →
    array_min): correct anywhere a Column fits, but Spark's
    higher-order array functions are INTERPRETED per element — for the
    hot path use :func:`winnow_fingerprints` (Arrow kernel, measured
    ~5× faster at sf0.1). Docs shorter than ``window`` hash whole. No
    shuffle either way."""
    c = F.col(text) if isinstance(text, str) else text
    n_windows = F.greatest(F.length(c) - F.lit(window - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.md5(c.substr(i, F.lit(window))),
    )
    return F.array_min(hashes)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Kernel form of :func:`winnow_fingerprint`: (``id_col``, wfp) via
    one Arrow batch pass — hashlib md5 over character windows, one
    output row per doc, zero shuffle. Bit-identical to the expression
    form and the SQL oracle (md5 of UTF-8 bytes of the character
    window; lexicographic min over hex digests). The id column keeps
    its input name in the output."""
    import hashlib

    import pandas as pd

    from async_pipes_spark.operators.partitioning import fan_out

    def kernel(batches):
        md5 = hashlib.md5
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ids.append(did)
                if text is None:
                    # the expression form yields NULL for NULL text
                    # (substr/md5/array_min propagate) — match it
                    # instead of crashing the task on len(None)
                    fps.append(None)
                    continue
                n = max(len(text) - window + 1, 1)
                fps.append(
                    min(md5(text[i : i + window].encode()).hexdigest() for i in range(n))
                )
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"), "wfp": fps})

    return fan_out(df.select(id_col, text_col)).mapInPandas(
        kernel, f"{id_col} bigint, wfp string"
    )


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scores: token counts, type/token ratio,
    mean token length, stopword ratio, non-alphanumeric ratio.

    One narrow projection — no shuffle; scales linearly with the scan.
    """
    toks = ws_tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    n_types = F.size(F.array_distinct(toks)).cast("bigint")
    text = F.col(text_col)
    n_chars = F.length(text).cast("bigint")
    n_alnum = F.length(F.regexp_replace(text, r"[^A-Za-z0-9]", "")).cast("bigint")
    # stopword set = the head of the shared English profile (one
    # definition with langid_scores — an inline copy would drift), and
    # tokens are lowercased like langid does, so sentence-initial
    # capitals still count
    stop_set = LANG_PROFILES["en"][:5]
    lower_toks = ws_tokens(F.lower(text))
    stop_hits = F.size(
        F.filter(lower_toks, lambda t: t.isin(*stop_set))
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_types.alias("n_types"),
        micro_units(n_types / n_tok).alias("ttr_micro"),
        micro_units((n_chars - (n_tok - 1)) / n_tok).alias("mean_tok_len_micro"),
        micro_units(stop_hits / n_tok).alias("stop_ratio_micro"),
        micro_units((n_chars - n_alnum) / n_chars).alias("nonalnum_ratio_micro"),
    )


def langid_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: per language, the number of token
    occurrences hitting that language's profile; prediction = argmax
    (ties broken by language code order). Pure array intrinsics."""
    from async_pipes_spark.operators.partitioning import fan_out

    df = fan_out(df)
    toks = ws_tokens(F.lower(F.col(text_col)))
    cols = [F.col(id_col)]
    hit_cols = []

    def _hit_filter(profile):
        # nested so Spark sees a one-arg lambda (a default arg would
        # make it look like the (element, index) two-arg form)
        return lambda t: t.isin(*profile)

    for lang, profile in sorted(LANG_PROFILES.items()):
        hits = F.size(F.filter(toks, _hit_filter(profile))).cast("bigint")
        cols.append(hits.alias(f"hits_{lang}"))
        hit_cols.append((lang, f"hits_{lang}"))
    out = df.select(*cols)
    # argmax with deterministic tie-break on language code
    pred = None
    for lang, c in hit_cols:
        if pred is None:
            pred = F.struct(F.col(c).alias("h"), F.lit(lang).alias("l"))
        else:
            cand = F.struct(F.col(c).alias("h"), F.lit(lang).alias("l"))
            pred = F.when(F.col(c) > pred.getField("h"), cand).otherwise(pred)
    return out.withColumn("pred_lang", pred.getField("l"))


def duplicate_ngram_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document duplicate n-gram fraction — the Gopher-family
    repetition quality signal (Rae et al. 2021 §A1.1: documents whose
    n-grams repeat heavily are boilerplate/spam): (doc_id,
    total_ngrams, uniq_ngrams, dup_micro) where dup_micro =
    micro_units(1 - uniq/total). Documents shorter than ``n`` tokens
    emit no row (no n-grams to judge).

    Scale shape: the shingle kernel is one scan pass; the aggregation
    is a single shuffle on doc_id with map-side partial aggregation.
    The distinct-count per doc is exact (count_distinct) — the group is
    one document's n-grams, bounded by document length, never corpus-
    sized."""
    from async_pipes_spark.functions.dedup import shingles

    sh = shingles(df, text_col=text_col, id_col=id_col, n=n)
    return (
        sh.groupBy(F.col("doc_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count_distinct("shingle").alias("uniq_ngrams"),
        )
        .select(
            id_col,
            "total_ngrams",
            "uniq_ngrams",
            micro_units(
                (F.col("total_ngrams") - F.col("uniq_ngrams")) / F.col("total_ngrams")
            ).alias("dup_micro"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document fluency score under a corpus-trained bigram
    language model — the classic model-based quality signal a
    pretraining pipeline runs after the rule-based ones (perplexity
    filtering à la CCNet/Gopher, here with the corpus itself as the
    LM): (doc_id, n_bigrams, avg_p_micro), where avg_p_micro is the
    mean conditional bigram probability P(w2|w1) = c(w1 w2)/c(w1 ·) in
    integer micro-units. Averaging probabilities (not log-probs) keeps
    every arithmetic step IEEE-exact (÷, ×, +, floor) so a DuckDB
    oracle hash-matches — ln() is not bit-specified across engines.
    Documents with fewer than 2 tokens emit no row (no bigrams).

    Per-bigram probabilities canonicalize to integer micro-units
    BEFORE the per-doc sum (the a4 combine-order-independence trick):
    integer addition commutes exactly, so partial aggregation across
    any partitioning yields identical results.

    Scale shape: ONE shingle-kernel scan (n=2), immediately collapsed
    to per-(doc, bigram) multiplicities — the same kernel→Exchange→
    Aggregate subtree then feeds BOTH the model and the scoring join,
    and AQE's stage reuse executes it once (the d6 ReusedExchange
    shape, plan-tested; an explicit repartition variant measured two
    kernel executions because the REPARTITION_BY_COL stage didn't
    dedupe). The prefix marginal c(w1 ·) is a window sum over the
    already-aggregated vocab-sized model, not a second corpus pass.
    Scoring joins per-doc bigrams many-to-ONE to the model — the skew
    shape AQE splits automatically — then one groupBy(doc_id), with
    occurrence multiplicities as weights. Nothing is collected; the
    model stays distributed.

    ``model_df`` trains the LM on a DIFFERENT corpus (the held-out
    perplexity-gate shape: train on a trusted slice, score candidates
    against it). Bigrams unseen by the model score probability 0 via a
    LEFT join (no smoothing — unseen mass simply penalizes the doc,
    monotone in the filter direction and exactly oracle-replicable);
    the self-trained path keeps its inner join, where every bigram is
    its own training evidence and the join kinds coincide."""
    from pyspark.sql import Window

    from async_pipes_spark.functions.dedup import shingles

    def per_pair_of(frame: DataFrame) -> DataFrame:
        # the explicit (vacuously true) isnotnull matches the null
        # filter the scoring join pushes down on ITS side of the
        # subtree — without it the two consumers' subtrees differ by
        # that one Filter node and AQE cannot dedupe the stage (kernel
        # would run twice)
        return (
            shingles(frame, text_col=text_col, id_col=id_col, n=2)
            .filter(F.col("shingle").isNotNull())
            .groupBy("doc_id", "shingle")
            .agg(F.count(F.lit(1)).alias("m"))
        )

    per_pair = per_pair_of(df)
    model_pairs = per_pair if model_df is None else per_pair_of(model_df)
    model = model_pairs.groupBy("shingle").agg(F.sum("m").alias("c_bg"))
    w1 = Window.partitionBy(F.substring_index("shingle", " ", 1))
    scored = model.select(
        "shingle",
        micro_units(F.col("c_bg") / F.sum("c_bg").over(w1)).alias("p_micro"),
    )
    how = "inner" if model_df is None else "left"
    p = F.col("p_micro") if model_df is None else F.coalesce("p_micro", F.lit(0))
    return (
        per_pair.join(scored, "shingle", how)
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.floor(F.sum(F.col("m") * p) / F.sum("m") + F.lit(0.5))
            .cast("bigint")
            .alias("avg_p_micro"),
        )
    )


def redact(
    df: DataFrame,
    col: str,
    patterns: dict[str, str],
    out_col: str = "redacted",
) -> DataFrame:
    """Pattern scrubbing — the PII-redaction primitive every corpus
    runs before training (strip emails/phones/ids, count what was
    found): adds one ``n_<label>`` match-count column per pattern and
    ``out_col`` with every match replaced by ``[LABEL]``. Patterns
    apply in dict order against the ORIGINAL text for counting and
    cumulatively for replacement (later patterns see earlier
    redactions — order ambiguous-overlap patterns accordingly).

    Scale shape: pure JVM regexp codegen (regexp_count /
    regexp_replace) — zero Python, zero shuffles; runs at scan speed
    and pushes column pruning through. Keep patterns RE2-compatible
    (no backrefs/lookaround) so external engines reproduce them."""
    out = df
    red = F.col(col)
    for label, pat in patterns.items():
        out = out.withColumn(f"n_{label}", F.regexp_count(F.col(col), F.lit(pat)))
        # the replacement string is a Matcher template: '$' and '\' are
        # group-reference metacharacters, so a label like 'us$' would
        # throw (or silently substitute capture text) unescaped
        repl = f"[{label.upper()}]".replace("\\", "\\\\").replace("$", "\\$")
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into fixed-token training chunks with overlap —
    the context-window chunking step every pretraining / RAG-indexing
    pipeline runs: (doc_id, chunk_id, n_tokens, chunk_text). Chunk c
    covers tokens [c*stride, c*stride + chunk); the last chunk may be
    short; a doc of ≤ ``chunk`` tokens yields exactly one chunk.
    ``stride < chunk`` gives ``chunk - stride`` tokens of overlap.

    Scale shape: pure JVM array HOFs (split → sequence → transform →
    posexplode-style flatten) inside the scan stage — no Python, no
    shuffle at all; output fan-out is ~n_tokens/stride rows per doc,
    bounded by document length."""
    if not (0 < stride <= chunk):
        raise ValueError("need 0 < stride <= chunk")
    toks = F.split(F.col(text_col), " ", -1)
    n = F.size(toks)
    # integer-exact chunk count: 1 + ceil((n - chunk)/stride) for
    # n > chunk else 1, via (a + stride - 1) div stride on ints
    last = F.when(
        n > chunk,
        F.floor((n - F.lit(chunk) + F.lit(stride - 1)) / F.lit(stride)).cast("int"),
    ).otherwise(F.lit(0))
    pieces = F.transform(
        F.sequence(F.lit(0), last),
        lambda c: F.struct(
            c.cast("bigint").alias("chunk_id"),
            F.slice(toks, c * stride + 1, chunk).alias("arr"),
        ),
    )
    return df.select(
        id_col, F.explode(pieces).alias("p")
    ).select(
        id_col,
        F.col("p.chunk_id").alias("chunk_id"),
        F.size("p.arr").cast("bigint").alias("n_tokens"),
        F.array_join("p.arr", " ").alias("chunk_text"),
    )


def top_bigram_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document TOP-bigram coverage — the second Gopher-family
    repetition signal (Rae et al. 2021 §A1.1 "top n-gram fraction":
    templated/spam documents spend a large share of their tokens
    inside one repeated phrase, which the duplicate-n-gram FRACTION of
    :func:`duplicate_ngram_stats` can miss when the rest of the
    document is clean): ``(doc_id, n_tokens, top_bigram, top_count,
    top_frac_micro)`` where top_frac_micro = micro_units(2·top_count /
    n_tokens). Ties on count break to the lexicographically LARGEST
    bigram (struct-max order — pinned, so the oracle can replay it).
    Documents with fewer than 2 tokens emit no row (no bigrams).

    Scale shape: one shingle-kernel scan → groupBy(doc_id, bigram)
    with map-side partial aggregation (keys are content-diverse, never
    skewed) → a per-doc struct-max over the already-collapsed counts
    (second shuffle carries one row per distinct per-doc bigram).
    n_tokens is recovered as sum(counts)+1 — no second corpus scan."""
    from async_pipes_spark.functions.dedup import shingles

    cnt = (
        shingles(df, text_col=text_col, id_col=id_col, n=2)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cnt.groupBy(F.col("doc_id").alias(id_col))
        .agg(
            F.max(F.struct(F.col("c"), F.col("shingle"))).alias("_top"),
            F.sum("c").alias("_nb"),
        )
        .select(
            id_col,
            (F.col("_nb") + 1).cast("bigint").alias("n_tokens"),
            F.col("_top.shingle").alias("top_bigram"),
            F.col("_top.c").cast("bigint").alias("top_count"),
            micro_units(
                F.lit(2) * F.col("_top.c") / (F.col("_nb") + 1)
            ).alias("top_frac_micro"),
        )
    )
