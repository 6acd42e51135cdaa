"""Data-quality audit operators — the validation stage a production
pipeline runs between ingest and training (null/domain/range checks,
key uniqueness, referential integrity), reported as one row per check
so a sink/alerting system can diff runs.

Scale shape: every row-predicate check folds into ONE conditional-
aggregation pass over the table (a single scan, map-side partial
aggregation, one tiny shuffle) no matter how many checks are
registered — never one job per check. Key-uniqueness rides the same
pass as ``count - count_distinct``. Referential integrity is the only
check needing a second input: an anti-join projected to the key
columns (semi/anti ship no payload).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_audit(
    df: DataFrame,
    checks: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Run named VIOLATION predicates over ``df`` in one scan:
    (check, n_violations, n_checked, ok). ``checks`` maps check name →
    boolean Column that is true when the ROW VIOLATES the check.
    ``unique_keys`` maps check name → key column list whose duplicates
    count as violations (``count(*) - count(distinct keys)``)."""
    if not checks and not unique_keys:
        raise ValueError("no checks registered")
    dup_names = set(checks) & set(unique_keys or {})
    if dup_names:
        raise ValueError(
            f"check names used in both checks and unique_keys: {sorted(dup_names)}"
        )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in checks.items():
        aggs.append(F.sum(pred.cast("bigint")).alias(f"_v_{name}"))
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(k) for k in keys])
            ).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    rows = [
        wide.select(
            F.lit(name).alias("check"),
            F.coalesce(F.col(f"_v_{name}"), F.lit(0)).alias("n_violations"),
            F.col("_n").alias("n_checked"),
        )
        for name in list(checks) + list(unique_keys or {})
    ]
    out = reduce(DataFrame.unionByName, rows)
    return out.select(
        "check",
        "n_violations",
        "n_checked",
        (F.col("n_violations") == 0).alias("ok"),
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    check_name: str = "referential_integrity",
) -> DataFrame:
    """Orphaned-foreign-key check: child rows whose ``fk`` has no
    matching ``pk`` in parent (NULL fks are orphans too — use a
    dedicated null check to separate them). Same (check, n_violations,
    n_checked, ok) contract as :func:`dq_audit`. The anti-join ships
    only the key column of both sides."""
    # alias the parent key: when fk and pk share a column name (the
    # normal FK convention) an unaliased join condition is ambiguous
    parent_keys = parent.select(F.col(pk).alias("_dq_pk"))
    orphans = child.select(F.col(fk)).join(
        parent_keys, F.col(fk) == F.col("_dq_pk"), "left_anti"
    )
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(child.agg(F.count(F.lit(1)).alias("n_checked")))
        .select(
            F.lit(check_name).alias("check"),
            "n_violations",
            "n_checked",
            (F.col("n_violations") == 0).alias("ok"),
        )
    )
