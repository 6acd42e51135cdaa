"""Count the Spark JOBS one contract query launches.

    python tools/job_count.py <query> [sf_dir]

The local scheduling floor (~0.2-0.5 s/job on local[32]) makes driver
job COUNT the load-immune proxy for lifecycle-query wall clock (r12
verdict: the remaining IVM cost is job count, not data path). Reads
the DAGScheduler's monotonically increasing nextJobId before and
after the query body — exact, no sampling.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from async_pipes_spark.session import get_spark

    queries = entry.queries()
    fn = queries[name]
    spark = get_spark("jobcount", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    queries["p6_map_reduce"](spark, sf_dir).collect()  # warm

    def next_job_id() -> int:
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    j0 = next_job_id()
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    rows = df.toPandas()
    wall = time.perf_counter() - t0
    j1 = next_job_id()
    print(f"{name}: {wall:.2f}s wall, {j1 - j0} jobs, {len(rows)} rows", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
