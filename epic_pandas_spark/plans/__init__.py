from epic_pandas_spark.plans.registry import REGISTRY, queries, oracle_sql

__all__ = ["REGISTRY", "queries", "oracle_sql"]
