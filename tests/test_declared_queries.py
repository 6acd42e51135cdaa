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
