"""Stress the two IVM contract queries under the environment knobs a
verification-driver host could plausibly vary — the round-10 repro
harness for the r9 driver-only hash divergence (CORRECTNESS_r09 red on
v4/s32; four same-HEAD re-runs green).

Per iteration it randomizes:
- ``tempfile.tempdir`` → a PATHOLOGICAL root containing literal
  ``_data`` and delta-shaped (``x_<hex>``) segments (the
  input-file-name-attribution suspect, now prefix-proofed in
  sinks.py);
- ``spark.sql.shuffle.partitions`` on the outer session (2..64);
- ``TZ`` (with ``time.tzset``);
- background parallel load: a concurrent thread running an unrelated
  contract query on the same SparkContext.

Every run's sorted output rows must be byte-identical to the first
run's at the same sf. Usage::

    python tools/stress_ivm.py [iterations] [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import random
import sys
import tempfile
import threading
import time
import uuid
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from async_pipes_spark.plans.extensions import (  # noqa: E402
    EXTENSION_QUERIES,
    t1_quality_metrics,
)
from async_pipes_spark.session import get_spark  # noqa: E402

QUERIES = ("v4_ivm_agg_view", "s32_stream_ivm_rollup",
           "v5_ivm_filtered_avg_view", "v6_ivm_join_view",
           "v7_ivm_join_minmax_view", "v8_ivm_count_distinct_view")
TZS = ("UTC", "America/New_York", "Asia/Tokyo", "Europe/Berlin",
       "Pacific/Kiritimati")


def row_sha(rows) -> str:
    canon = "\n".join(repr(r) for r in sorted(map(tuple, rows)))
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001",
                               "/root/testdata/sf0.01"]
    rng = random.Random(0x57E55)
    spark = get_spark("stress-ivm", cpus=8)
    want: dict[tuple[str, str], str] = {}
    fails = 0
    stop = threading.Event()

    def background():
        while not stop.is_set():
            try:
                t1_quality_metrics(spark, sf_dirs[0]).collect()
            except Exception:
                pass

    bg = threading.Thread(target=background, daemon=True)
    bg.start()
    try:
        for i in range(iters):
            sf = sf_dirs[i % len(sf_dirs)]
            evil = (
                f"/tmp/stress_ivm/_data/x_{uuid.uuid4().hex[:12]}"
                f"/_data/run{i}"
            )
            os.makedirs(evil, exist_ok=True)
            tempfile.tempdir = evil
            os.environ["TZ"] = rng.choice(TZS)
            time.tzset()
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(rng.choice(
                    [2, 3, 7, 8, 16, 32, 64]))
            )
            for name in QUERIES:
                t0 = time.perf_counter()
                try:
                    rows = EXTENSION_QUERIES[name](spark, sf).collect()
                    sha = row_sha(rows)
                except Exception as e:  # noqa: BLE001
                    print(f"[{i:02d}] {name} {sf}: ERROR {e}")
                    fails += 1
                    continue
                key = (name, sf)
                if key not in want:
                    want[key] = sha
                    verdict = "baseline"
                else:
                    verdict = "ok" if sha == want[key] else "DIVERGED"
                    if verdict == "DIVERGED":
                        fails += 1
                print(
                    f"[{i:02d}] {name} {Path(sf).name} sha={sha} "
                    f"{verdict} ({time.perf_counter() - t0:.1f}s, "
                    f"tz={os.environ['TZ']}, "
                    f"sp={spark.conf.get('spark.sql.shuffle.partitions')}, "
                    f"tmp=…{evil[-24:]})",
                    flush=True,
                )
    finally:
        stop.set()
        tempfile.tempdir = None
        os.environ["TZ"] = "UTC"
        time.tzset()
    print(f"\n{'ALL STABLE' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
