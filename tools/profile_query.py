"""Profile one contract query's driver-side wall time.

    python tools/profile_query.py <query_name> [sf_dir] [--cprofile]

Runs the query once warm (after a p6 warmup), prints wall seconds and,
with --cprofile, the cumulative-time top of the Python driver profile —
py4j socket waits are charged to the engine function that blocks on
them, so the per-function breakdown says which engine verbs (mor
commits, pins, state reads) own the wall clock even though the work
itself happens in the JVM."""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_prof = "--cprofile" in sys.argv
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from async_pipes_spark.session import get_spark

    queries = entry.queries()
    fn = queries[name]
    spark = get_spark("profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    queries["p6_map_reduce"](spark, sf_dir).collect()  # warm

    spark.sparkContext.setJobDescription(f"profile: {name}")
    t0 = time.perf_counter()
    if do_prof:
        prof = cProfile.Profile()
        prof.enable()
    df = fn(spark, sf_dir)
    rows = df.toPandas()
    if do_prof:
        prof.disable()
    wall = time.perf_counter() - t0
    print(f"{name}: {wall:.2f}s wall, {len(rows)} rows", flush=True)
    if do_prof:
        s = io.StringIO()
        st = pstats.Stats(prof, stream=s)
        st.sort_stats("cumulative").print_stats(60)
        print(s.getvalue())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
