"""Dump .explain("formatted") for declared queries into plans/r<N>/.

    python tools/dump_plans.py <out_dir> [query ...]

Defaults to every DECLARED query (the BASELINE.md-comparable suite —
the extension lifecycles return materialized local frames whose plans
are trivial; their interesting plans are internal and are pinned by
tests/test_plans.py instead)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    out_dir = Path(sys.argv[1])
    names = sys.argv[2:]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from async_pipes_spark.session import get_spark

    queries = entry.queries()
    if not names:
        from async_pipes_spark.plans.declared import DECLARED_QUERIES
        from async_pipes_spark.plans.joins import JOIN_QUERIES

        names = list(DECLARED_QUERIES) + list(JOIN_QUERIES)
    spark = get_spark("dump-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(name, "->", out_dir / f"{name}_{suffix}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
