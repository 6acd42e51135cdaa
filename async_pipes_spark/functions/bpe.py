"""Distributed BPE (byte-pair-encoding) merge learning — the
tokenizer-training step of an LLM data pipeline, run as Spark
aggregations over the corpus word-frequency table.

Algorithm (Sennrich et al. 2016, the standard subword tokenizer):
start from character symbols, repeatedly (1) count adjacent symbol
pairs weighted by word frequency, (2) take the most frequent pair,
(3) merge that pair into one symbol everywhere; the sequence of merges
IS the tokenizer.

Scale shape per iteration: ONE pair-count aggregation over the word
table (explode of adjacent-pair arrays → groupBy sum, map-side
partial), ONE driver collect of exactly one row (the argmax pair — the
same bounded-collect shape as the PageRank loop), and a map-only merge
application. The word table is vocabulary-sized (distinct words ×
frequency), not corpus-sized: the corpus is reduced once up front.
K iterations = K tiny jobs; no join, no growing state.

Engine-exact contract: a word's symbol sequence is carried as a
space-delimited STRING (`" a b c "`), and a merge is applied as the
SAME fixed two-pass leftmost non-overlapping string replace on every
engine (`replace(replace(s, " a b ", " ab "), ...)`). Two passes are
applied unconditionally: one pass misses adjacent occurrences whose
boundary space the previous match consumed (`" a b a b "` →
`" ab a b "`), the second catches them. This replace-pass semantics is
deterministic and identical across engines by construction (classic
greedy-fold BPE can order interior runs differently, e.g. `aaaaa` →
[aa, aa, a] vs [aa, a, aa]; the contract here is the replace form).
Pair argmax ties break on (count DESC, left ASC, right ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from async_pipes_spark.session import pin as _pin


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the corpus reduction BPE
    trains on (one shuffle, map-side combined)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _initial_seq() -> F.Column:
    """word → ``" w o r d "``: one space-separated symbol per char.
    DOTALL ('(?s)' / DuckDB flag 's') so a newline inside a word —
    space-delimited tokenization keeps them — splits into its own
    symbol like any other character instead of staying fused to its
    neighbor; both engines verified to produce identical output."""
    return F.concat(
        F.regexp_replace(F.col("word"), "(?s)(.)", " $1"), F.lit(" ")
    )


def _merge_once(seq: F.Column, left: str, right: str) -> F.Column:
    """One deterministic merge application: two passes of leftmost
    non-overlapping literal replace (see module docstring)."""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    return F.replace(F.replace(seq, pat, rep), pat, rep)


def learn_bpe_merges(
    docs: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus; returns the
    merge table (step, left, right, merged, pair_count) — the
    tokenizer artifact, in learned order.

    Driver involvement per iteration is ONE row (the argmax pair);
    everything else is distributed aggregation over the vocabulary
    table. ``k`` is the only driver-side loop bound (like the
    PageRank iteration count)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    merges, _ = _learn(_checkpointed_words(docs, text_col), k)
    return docs.sparkSession.createDataFrame(
        merges, "step bigint, left string, right string, merged string, pair_count bigint"
    )


def _checkpointed_words(docs: DataFrame, text_col: str) -> DataFrame:
    """The corpus reduction, pinned ONCE: without the checkpoint,
    iteration i's pair-count job re-runs the full corpus scan + word
    shuffle through the lineage — k corpus scans instead of 1 (at
    100 TB the difference between the loop costing k tiny vocab jobs
    and k full passes). The checkpointed table is vocabulary-sized."""
    return (
        word_frequencies(docs, text_col)
        .withColumn("seq", _initial_seq())
        .transform(_pin)
    )


def _learn(words: DataFrame, k: int):
    """Run the merge loop over a checkpointed (word, cnt, seq) frame.
    Returns (merge tuples, the words frame with every learned merge
    applied) so encoding can reuse the same single corpus reduction."""
    merges = []
    for step in range(1, k + 1):
        toks = F.split(F.trim(F.col("seq")), " ")
        pairs = (
            words.filter(F.size(toks) > 1)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice(toks, 1, F.size(toks) - 1).alias("a"),
                        F.slice(toks, 2, F.size(toks) - 1).alias("b"),
                    )
                ).alias("z"),
            )
            .groupBy(F.col("z.a").alias("a"), F.col("z.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], best[0]["n"]
        merges.append((step, a, b, a + b, n))
        words = words.withColumn("seq", _merge_once(F.col("seq"), a, b))
        # re-pin periodically: without it the seq expression stacks one
        # nested replace per iteration — iteration i re-evaluates i-1
        # replaces (O(k²) work) and the growing plan eventually chokes
        # Catalyst at realistic merge counts (k in the thousands). The
        # pin materializes the vocab-sized frame, so the per-iteration
        # cost stays flat; 8 unpinned steps amortize the pin job.
        if step % 8 == 0:
            words = _pin(words)
    return merges, words


def tokenized_lengths(
    docs: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply the first ``k`` learned merges to the corpus and return
    per-document subword statistics (doc_id, n_words, n_subwords) —
    the encode step of the tokenizer, and the number that actually
    matters downstream (sequence lengths / packing budgets).

    Scale shape: training reduces the corpus once and pins the vocab
    table (:func:`_checkpointed_words`); ENCODING reuses that SAME
    frame — the merge loop already applied every learned merge to it,
    so no second corpus scan happens. Each distinct word is segmented
    once in the vocabulary table, and the corpus maps against that
    table via a broadcast join on the word key (vocab ≪ corpus; drop
    the hint and let AQE shuffle-join if a tokenizer vocab ever
    outgrows memory)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    _, seg = _learn(_checkpointed_words(docs, text_col), k)
    vocab = seg.select(
        "word", F.size(F.split(F.trim(F.col("seq")), " ")).alias("n_sub")
    )
    return (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


def _bpe_ctes(k: int) -> str:
    """The shared unrolled-CTE chain: w0 (char-split vocab) through
    w{k} (vocab after k merges), with pairs{i}/best{i} per level."""
    ctes = [
        """
        w0 AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
                   regexp_replace(word, '(.)', ' \\1', 'gs') || ' ' AS seq
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word
        )"""
    ]
    for i in range(1, k + 1):
        p = i - 1
        ctes.append(
            f"""
        l{i} AS (
            SELECT cnt, string_split(trim(seq), ' ') AS t FROM w{p}
        ),
        pairs{i} AS (
            SELECT t[g] AS a, t[g + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
            FROM (SELECT cnt, t, unnest(generate_series(1, len(t) - 1)) AS g
                  FROM l{i} WHERE len(t) > 1)
            GROUP BY 1, 2
        ),
        best{i} AS (
            SELECT a, b, n FROM pairs{i} ORDER BY n DESC, a, b LIMIT 1
        ),
        w{i} AS (
            -- LEFT JOIN ON TRUE, not CROSS JOIN: when the corpus
            -- exhausts its pairs before k merges, best{i} is EMPTY and
            -- a cross join would annihilate the vocab (the engine
            -- simply stops merging); COALESCE passes seq through
            SELECT w.word, w.cnt,
                   COALESCE(replace(replace(w.seq,
                                            ' ' || b.a || ' ' || b.b || ' ',
                                            ' ' || b.a || b.b || ' '),
                                    ' ' || b.a || ' ' || b.b || ' ',
                                    ' ' || b.a || b.b || ' '), w.seq) AS seq
            FROM w{p} w LEFT JOIN best{i} b ON TRUE
        )"""
        )
    return "WITH " + ",".join(ctes)


def bpe_oracle_sql(k: int) -> str:
    """DuckDB SQL replaying the identical k merges (unrolled CTE per
    iteration, same pair counting, same argmax tie-break, same two-pass
    replace application) — used by the driver-contract oracle."""
    selects = "\n        UNION ALL ".join(
        f'SELECT {i} AS step, a AS "left", b AS "right", a || b AS merged, n AS pair_count FROM best{i}'
        for i in range(1, k + 1)
    )
    return (
        _bpe_ctes(k)
        + f'\n        SELECT CAST(step AS BIGINT) AS step, "left", "right", merged, pair_count FROM ({selects}) ORDER BY step'
    )


def bpe_encode_oracle_sql(k: int) -> str:
    """DuckDB SQL for :func:`tokenized_lengths`: segment the vocab with
    the same k merges, then per-doc word/subword counts."""
    return (
        _bpe_ctes(k)
        + f""",
        vocab AS (
            SELECT word,
                   CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_sub
            FROM w{k}
        ),
        dw AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        )
        SELECT doc_id, COUNT(*) AS n_words,
               CAST(SUM(n_sub) AS BIGINT) AS n_subwords
        FROM dw JOIN vocab USING (word)
        WHERE word <> ''
        GROUP BY doc_id ORDER BY doc_id
    """
    )
