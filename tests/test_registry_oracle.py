"""Local replica of the driver's correctness gate: run every REGISTRY query
on Spark and its oracle SQL on DuckDB over the same sf0.001 parquet, compare
row count + columns + order-insensitive values. Queries that pass here
should pass the driver's sf0.01 check identically."""

import pytest

from epic_pandas_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    fn, sql = REGISTRY[name]
    df = fn(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0  # rows-only smoke, like the driver's weak check
        return
    assert_matches_oracle(df, duck, sql)
