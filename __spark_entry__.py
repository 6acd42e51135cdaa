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
#: rows for the FIRST 50 ``queries()`` entries per round (r02-r07 all
#: cut at entry #50), so dict order IS driver coverage. Policy: queries
#: new this round and queries without a fresh driver row come FIRST;
#: the freshest greens rotate to the tail. Round-8 window (the r7
#: verdict's item 2, executed): the 2 NEW queries (z4 auto-pruning
#: scan planner, s30 streaming merge-on-read upsert), then ALL 33
#: queries whose freshest driver rows date to r05 (bpe1/bpe2, d9/d10,
#: g1/g2, mm1, r1-r10, s17-s22, t7-t12/t14, v1-v3 — the judge
#: re-verified them green in the r7 sweep; this window gives every one
#: a fresh driver row, after which EVERY query in the contract holds a
#: row from r6 or later), then 15 refreshes from the r06-green set
#: (a6/a7/d11/d12/smp5/s23/mm2/mm3/p1/p2/p4/p7/p8/p9/x2 — the oldest
#: evidence after the rotation). 2 + 33 + 15 = 50 exactly. The
#: remaining r06-green queries sit first after the cut (round-9
#: refresh candidates); the 50 r07-green queries hold the tail. Every
#: query keeps its oracle regardless of position.
_PRIORITY = [
    # new in round 8 — first driver row needed
    "z4_", "s30_",
    # the 33 r05-row queries — the r7 verdict's rotation list, complete
    "bpe1_", "bpe2_", "d9_", "d10_", "g1_", "g2_", "mm1_",
    *[f"r{i}_" for i in range(1, 11)],
    "s17_", "s18_", "s19_", "s20_", "s21_", "s22_",
    "t7_", "t8_", "t9_", "t10_", "t11_", "t12_", "t14_",
    "v1_", "v2_", "v3_",
    # 15 r06-green refreshes (oldest evidence once the 33 rotate)
    "a6_", "a7_", "d11_", "d12_", "smp5_", "s23_", "mm2_", "mm3_",
    "p1_", "p2_", "p4_", "p7_", "p8_", "p9_", "x2_",
    # ---- 50-cut ----
    # r06-green remainder: first in line for the round-9 window
    "x4_", "x5_", "x6_",
    "j1_", "j2_", "j3_", "j4_", "j5_",
    "k2_", "k3_", "a1_", "a5_", "b1_",
    "s4_", "s5_", "s9_", "s10_", "s11_", "s12_", "s13_", "s14_", "s15_", "s16_",
    "d1_", "d2_", "d3_", "d4_", "d5_", "d6_", "d7_", "d8_",
    "t1_", "t2_", "t3_", "t4_",
    # r07-green tail (freshest driver rows in the contract)
    "a8_", "s24_", "a9_", "d13_", "t15_", "s25_", "z1_", "f1_", "s26_",
    "z2_", "a10_", "r17_", "s27_", "a11_", "s28_", "r18_", "k5_", "mm4_",
    "smp6_", "t16_", "smp7_", "s29_", "pipe2_", "mm5_", "z3_",
    "t13_", "smp4_", "pipe1_",
    "p3_", "p5_", "p6_", "x1_", "x3_", "b2_", "t5_", "t6_",
    *[f"r{i}_" for i in range(11, 17)],
    "a2_", "a3_", "a4_", "k1_", "k4_",
    "smp1_", "smp2_", "smp3_",
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
