"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``async_pipes_spark`` package; this module
is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from async_pipes_spark.plans.declared import DECLARED_QUERIES  # noqa: E402
from async_pipes_spark.plans.extensions import (  # noqa: E402
    EXTENSION_ORACLES,
    EXTENSION_QUERIES,
)
from async_pipes_spark.plans.joins import JOIN_ORACLES, JOIN_QUERIES  # noqa: E402
from async_pipes_spark.plans.oracles import DECLARED_ORACLES  # noqa: E402
from async_pipes_spark.plans.relational import (  # noqa: E402
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference README's
    own map-reduce shape (P6 total-revenue fold)."""
    return DECLARED_QUERIES["p6_map_reduce"](spark, "/root/testdata/sf0.001")


#: Driver-contract ordering. The verification driver records correctness
#: rows for the FIRST 50 ``queries()`` entries per round (r02-r08 all
#: cut at entry #50), so dict order IS driver coverage. Policy: queries
#: new this round and queries without a fresh driver row come FIRST;
#: the freshest greens rotate to the tail. Round-9 window (the r8
#: verdict's item 5, executed): the 4 NEW queries (z5 skipping under
#: a live merge-on-read backlog, s31 change-data-feed, v4 incremental
#: view maintenance, s32 its streaming twin), then the 5 queries
#: whose CODE PATHS
#: round 9 rewrote (s30/z4 ride the new keep/contested MOR resolver
#: and delta-aware scan planner; a10/a11/s27 ride the explicit-states
#: index pointer commit and backlogged-probe pruning), then ALL 35
#: queries whose freshest driver rows date to r06 (x4-x6, j1-j5,
#: k2/k3, a1/a5, b1, s4/s5/s9-s16, d1-d8, t1-t4 — the exact rotation
#: list the r8 verdict staged; SWEEP_r08 re-proved them green
#: same-round), then 6 refreshes from the oldest r07-green evidence
#: (a8/s24/a9/d13/t15/z1 — z1 doubles as the verdict's item-8
#: watch). 4 + 5 + 35 + 6 = 50 exactly. After this window every
#: contract query holds a driver row from r7 or later. Every query
#: keeps its oracle regardless of position.
_PRIORITY = [
    # new in round 9 — first driver row needed
    "z5_", "s31_", "v4_", "s32_",
    # code paths rewritten in round 9 (MOR resolve, delta-aware
    # pruning, index pointer commit) — re-verify first
    "s30_", "z4_", "a10_", "a11_", "s27_",
    # the 35 r06-row queries — the r8 verdict's rotation list, complete
    "x4_", "x5_", "x6_",
    "j1_", "j2_", "j3_", "j4_", "j5_",
    "k2_", "k3_", "a1_", "a5_", "b1_",
    "s4_", "s5_", "s9_", "s10_", "s11_", "s12_", "s13_", "s14_", "s15_", "s16_",
    "d1_", "d2_", "d3_", "d4_", "d5_", "d6_", "d7_", "d8_",
    "t1_", "t2_", "t3_", "t4_",
    # 6 oldest-r07 refreshes (incl. the z1 perf watch; s25/f1/s26
    # slipped below the cut to make room for s31/v4/s32 — all stay
    # r07-green)
    "a8_", "s24_", "a9_", "d13_", "t15_", "z1_",
    # ---- 50-cut ----
    # r07-green remainder
    "s25_", "f1_", "s26_", "z2_", "r17_", "s28_", "r18_", "k5_", "mm4_",
    "smp6_", "t16_", "smp7_", "s29_", "pipe2_", "mm5_", "z3_",
    "t13_", "smp4_", "pipe1_",
    "p3_", "p5_", "p6_", "x1_", "x3_", "b2_", "t5_", "t6_",
    *[f"r{i}_" for i in range(11, 17)],
    "a2_", "a3_", "a4_", "k1_", "k4_",
    "smp1_", "smp2_", "smp3_",
    # r08-green tail (freshest driver rows in the contract)
    "bpe1_", "bpe2_", "d9_", "d10_", "g1_", "g2_", "mm1_",
    *[f"r{i}_" for i in range(1, 11)],
    "s17_", "s18_", "s19_", "s20_", "s21_", "s22_",
    "t7_", "t8_", "t9_", "t10_", "t11_", "t12_", "t14_",
    "v1_", "v2_", "v3_",
    "a6_", "a7_", "d11_", "d12_", "smp5_", "s23_", "mm2_", "mm3_",
    "p1_", "p2_", "p4_", "p7_", "p8_", "p9_", "x2_",
]


def _ordered(mapping: dict) -> dict:
    def rank(key: str) -> tuple[int, str]:
        for i, prefix in enumerate(_PRIORITY):
            if key.startswith(prefix):
                return (i, key)
        return (len(_PRIORITY), key)

    return dict(sorted(mapping.items(), key=lambda kv: rank(kv[0])))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(DECLARED_QUERIES)
    out.update(RELATIONAL_QUERIES)
    out.update(EXTENSION_QUERIES)
    out.update(JOIN_QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(DECLARED_ORACLES)
    out.update(RELATIONAL_ORACLES)
    out.update(EXTENSION_ORACLES)
    out.update(JOIN_ORACLES)
    return _ordered(out)
