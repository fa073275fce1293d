from pyspark.sql import functions as F

from epic_pandas_spark.frame import EpicFrame


def test_fluent_chain(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, "b", 3.0)], "id long, g string, v double"
    )
    ef = EpicFrame(df, key="id")
    out = ef.fillna({"v": 0.0}).value_counts("g")
    rows = {r["value"]: r["count"] for r in out.df.collect()}
    assert rows == {"a": 2, "b": 1}


def test_upsert_and_dataframe_passthrough(spark):
    a = EpicFrame(spark.createDataFrame([(1, "x")], "id long, v string"), key="id")
    b = spark.createDataFrame([(1, "X"), (2, "Y")], "id long, v string")
    merged = a.upsert(b)
    assert merged.count() == 2  # DataFrame passthrough via __getattr__
    filtered = merged.filter(F.col("id") == 2)  # stays fluent
    assert isinstance(filtered, EpicFrame)
    assert filtered.df.first()["v"] == "Y"


def test_transform_escape_hatch(spark):
    from epic_pandas_spark.operators.skew import salted_agg

    df = spark.createDataFrame([(i % 2, float(i)) for i in range(10)], "g int, v double")
    out = EpicFrame(df).transform(salted_agg, ["g"], {"n": ("*", "count")})
    assert {r["g"]: r["n"] for r in out.df.collect()} == {0: 5, 1: 5}


def test_sql_api_parity(spark):
    """The engine is declarative end-to-end: the same logical plan is
    reachable through raw spark.sql over registered views (Catalyst
    produces identical results either way)."""
    from epic_pandas_spark.session import load_table
    from epic_pandas_spark.operators import value_counts
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    li.createOrReplaceTempView("li_view")
    sql_out = {
        (r["value"], r["count"])
        for r in spark.sql(
            "SELECT l_returnflag AS value, COUNT(*) AS count FROM li_view GROUP BY 1"
        ).collect()
    }
    df_out = {(r["value"], r["count"]) for r in value_counts(li, "l_returnflag").select("value", "count").collect()}
    assert sql_out == df_out
