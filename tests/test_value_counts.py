from pyspark.sql import functions as F

from epic_pandas_spark.operators import value_counts, value_counts_binned
from epic_pandas_spark.session import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_value_counts_matches_oracle(spark, duck):
    li = load_table(spark, SF_DIR, "lineitem")
    out = value_counts(li, "l_returnflag").select(
        "value", "count", F.round("fraction", 6).alias("fraction")
    )
    assert_matches_oracle(
        out,
        duck,
        """
        SELECT l_returnflag AS value, COUNT(*) AS count,
               ROUND(COUNT(*) / (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NOT NULL), 6) AS fraction
        FROM lineitem WHERE l_returnflag IS NOT NULL
        GROUP BY l_returnflag
        """,
    )


def test_value_counts_total_row(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    rows = value_counts(li, "l_returnflag", total=True).collect()
    total_row = [r for r in rows if r["value"] == "TOTAL"]
    assert len(total_row) == 1
    assert total_row[0]["count"] == li.count()
    assert abs(total_row[0]["fraction"] - 1.0) < 1e-9


def test_value_counts_binned(spark, duck):
    li = load_table(spark, SF_DIR, "lineitem")
    out = value_counts_binned(li, "l_quantity", lo=0.0, hi=50.0, n_bins=10).select(
        "bin", "bin_lo", "bin_hi", "count", F.round("fraction", 6).alias("fraction")
    )
    assert_matches_oracle(
        out,
        duck,
        """
        WITH b AS (
          SELECT LEAST(10, GREATEST(1, CAST(FLOOR(l_quantity / 5.0) AS INT) + 1)) AS bin
          FROM lineitem WHERE l_quantity IS NOT NULL
        )
        SELECT bin, (bin-1)*5.0 AS bin_lo, bin*5.0 AS bin_hi, COUNT(*) AS count,
               ROUND(COUNT(*) / (SELECT COUNT(*) FROM b), 6) AS fraction
        FROM b GROUP BY bin
        """,
    )
