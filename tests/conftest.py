from __future__ import annotations

import duckdb
import pytest

from epic_pandas_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="epic_pandas_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(val):
    try:
        import pandas as pd

        if val is None or (isinstance(val, float) and pd.isna(val)):
            return "__null__"
    except TypeError:
        pass
    if isinstance(val, float):
        return round(val, 6)
    return val


def assert_matches_oracle(spark_df, duck_con, sql: str):
    """Mini replica of the driver's oracle check: row count, column names,
    and an order-insensitive multiset comparison of (rounded) values."""
    sdf = spark_df.toPandas()
    odf = duck_con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"row counts differ: spark={len(sdf)} oracle={len(odf)}"
    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(_normalize(v)) for v in row) for row in sdf[cols].itertuples(index=False, name=None)
    )
    orows = sorted(
        tuple(str(_normalize(v)) for v in row) for row in odf[cols].itertuples(index=False, name=None)
    )
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"row {i} differs:\n  spark:  {a}\n  oracle: {b}"
