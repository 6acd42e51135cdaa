"""Oracle tests for the declared query set (SURVEY.md §2.4) at the
smoke scale factor. The verification driver repeats this comparison at
sf0.01 via __spark_entry__; these tests are the fast local loop."""

import pytest

from async_pipes_spark.plans.declared import DECLARED_QUERIES
from async_pipes_spark.plans.oracles import DECLARED_ORACLES

from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_every_query_has_an_oracle():
    assert set(DECLARED_QUERIES) == set(DECLARED_ORACLES)


@pytest.mark.parametrize("name", sorted(DECLARED_QUERIES))
def test_declared_query_matches_oracle(spark, duck, name):
    df = DECLARED_QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, DECLARED_ORACLES[name], name=name)


def _all_batch_queries():
    from async_pipes_spark.plans.joins import JOIN_QUERIES
    from async_pipes_spark.plans.relational import RELATIONAL_QUERIES

    out = {}
    out.update(DECLARED_QUERIES)
    out.update(RELATIONAL_QUERIES)
    out.update(JOIN_QUERIES)
    return out


@pytest.mark.parametrize("name", sorted(_all_batch_queries()))
def test_no_decimal_output_columns(spark, name):
    """Driver-hash safety invariant: money leaves the engine as BIGINT
    cents, never DECIMAL — the driver's canonicalization stringifies
    trailing-zero decimal cents through a float path and hash-fails
    even on bit-identical values (VERDICT r1). Integer outputs are
    engine- and harness-stable."""
    from pyspark.sql.types import DecimalType

    df = _all_batch_queries()[name](spark, SF_SMOKE)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"{name} emits DECIMAL columns {bad}; use BIGINT cents"
