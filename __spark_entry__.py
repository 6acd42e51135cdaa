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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(DECLARED_QUERIES)
    out.update(RELATIONAL_QUERIES)
    out.update(EXTENSION_QUERIES)
    out.update(JOIN_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(DECLARED_ORACLES)
    out.update(RELATIONAL_ORACLES)
    out.update(EXTENSION_ORACLES)
    out.update(JOIN_ORACLES)
    return out
