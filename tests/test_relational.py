"""Oracle tests for the relational-layer query set (r*)."""

import pytest

from async_pipes_spark.plans.relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES

from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_every_relational_query_has_an_oracle():
    assert set(RELATIONAL_QUERIES) == set(RELATIONAL_ORACLES)


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_query_matches_oracle(spark, duck, name):
    df = RELATIONAL_QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, RELATIONAL_ORACLES[name], name=name)
