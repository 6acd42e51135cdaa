"""Oracle tests for the temporal-join query set (as-of / range join on
the events table) — DuckDB's native ASOF JOIN is the j1 oracle."""

import pytest

from async_pipes_spark.plans.joins import JOIN_ORACLES, JOIN_QUERIES

from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_every_join_query_has_an_oracle():
    assert set(JOIN_QUERIES) == set(JOIN_ORACLES)


@pytest.mark.parametrize("name", sorted(JOIN_QUERIES))
def test_join_query_matches_oracle(spark, duck, name):
    df = JOIN_QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, JOIN_ORACLES[name], name=name)
