"""DuckDB oracle SQL for the declared query set.

Shared canonicalization contract with plans.declared (what makes the
value-hash comparison exact across engines):

- **Money**: inputs are exact 2-decimal doubles → carried and OUTPUT
  as **BIGINT cents** (``CAST(FLOOR(x*100 + 0.5) AS BIGINT)`` per row;
  conversion is exact for 2-decimal doubles). Integer outputs hash
  identically across engines — DECIMAL outputs proved fragile in the
  driver's canonicalization (trailing-zero cents stringify
  differently), and BIGINT also skips the per-row BigDecimal collect
  cost. Derived revenue uses the decimal-space ROUND for the oracle
  (exact) × 100 → BIGINT; the Spark side computes the identical value
  in pure long arithmetic (functions.money.revenue_cents).
- **Floats** (embeddings, similarities): canonicalized to integer
  micro-units ``CAST(FLOOR(x*1000000 + 0.5) AS BIGINT)`` — pure
  IEEE-754 double ops, identical in both engines. Dot products use
  DuckDB ``list_inner_product`` ≡ sequential float32 fold, which the
  Spark side replicates exactly (functions.vectors.dot_f32).
- **Timestamps**: ``events.ts`` is ns; both sides truncate to µs.
- **Counts/sums of ints**: cast to BIGINT (DuckDB SUM yields HUGEINT).
- Column names match the Spark plans exactly; ORDER BY is irrelevant to
  the driver's order-insensitive hash but kept for reproducibility.
"""

DECLARED_ORACLES = {
    "p1_projection": """
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2))), 2)
                    * 100 AS BIGINT) AS revenue_cents
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
    "p2_filter_fold": """
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 30
    """,
    "p3_flatten": """
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS pos,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS val_micro
        FROM embeddings
        WHERE vec_id < 10
        ORDER BY vec_id, pos
    """,
    "p4_route_fold": """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "p5_fan_in": """
        SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM (
            SELECT c_custkey AS k FROM customer
            UNION ALL
            SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier
        )
    """,
    "p6_map_reduce": """
        SELECT CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                                   * (1 - CAST(l_discount AS DECIMAL(18,2))), 2)
                             * 100 AS BIGINT))
                    AS BIGINT) AS total_revenue_cents
        FROM lineitem
    """,
    "p7_running_total": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    "p8_cycle": """
        WITH RECURSIVE halve(o_orderkey, v, n) AS (
            SELECT o_orderkey, o_totalprice, 0 FROM orders
            UNION ALL
            SELECT o_orderkey, v / 2, n + 1 FROM halve WHERE v >= 100
        )
        SELECT o_orderkey, CAST(MAX(n) AS BIGINT) AS steps
        FROM halve GROUP BY o_orderkey ORDER BY o_orderkey
    """,
    "p9_tumbling_window": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "x1_exact_dedup": """
        SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dups
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "x2_cosine_top1": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        pairs AS (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   list_inner_product(q.embedding, c.embedding) AS dot,
                   sqrt(list_inner_product(q.embedding, q.embedding)) AS qn,
                   sqrt(list_inner_product(c.embedding, c.embedding)) AS cn
            FROM q, embeddings c
            WHERE q.vec_id != c.vec_id
        ),
        sims AS (
            SELECT q_id, c_id,
                   CAST(FLOOR(dot / (qn * cn) * 1000000 + 0.5) AS BIGINT) AS sim_micro
            FROM pairs
        ),
        ranked AS (
            SELECT q_id, c_id, sim_micro,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY sim_micro DESC, c_id) AS rn
            FROM sims
        )
        SELECT q_id, c_id AS best_id, sim_micro AS best_sim_micro
        FROM ranked WHERE rn = 1 ORDER BY q_id
    """,
    "x3_text_stats": """
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
               CAST(COUNT(*) FILTER (WHERE text LIKE '%spark%') AS BIGINT) AS with_kw
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "x4_sessionize": """
        WITH g AS (
            SELECT user_id,
                   CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                            > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions
        FROM g GROUP BY user_id ORDER BY user_id
    """,
    "x5_json_buckets": """
        SELECT TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "x6_top_customers": """
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
        ORDER BY spend_cents DESC, c.c_custkey
        LIMIT 10
    """,
}
