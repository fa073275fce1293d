"""I/O dispatch, autoload, and keyed helpers (lookup / explicit order)."""

import pytest
from pyspark.sql import functions as F

from epic_pandas_spark.keyed import lookup, order_by_key_list
from epic_pandas_spark.sources.io import load, dump, autoload, _extension


def test_extension_parsing():
    assert _extension("/a/b/data.parquet") == "parquet"
    assert _extension("s3://bucket/x.CSV") == "csv"


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    path = str(tmp_path / "t.parquet")
    dump(df, path)
    back = load(spark, path, expect_columns=["k", "v"])
    assert {(r["k"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_csv_roundtrip_and_options(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    path = str(tmp_path / "t.csv")
    dump(df, path)
    back = load(spark, path, schema="k long, v string")
    assert back.first()["v"] == "a"


def test_load_rejects_pickle(spark):
    with pytest.raises(ValueError, match="no distributed analog"):
        load(spark, "/tmp/x.pkl")


def test_expect_columns_raises(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "k long")
    path = str(tmp_path / "e.parquet")
    dump(df, path)
    with pytest.raises(TypeError, match="missing expected columns"):
        load(spark, path, expect_columns=["nope"])


def test_autoload_decorator(spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    path = str(tmp_path / "a.parquet")
    dump(df, path)

    @autoload("data")
    def count_rows(spark, data):
        return data.count()

    assert count_rows(spark, data=path) == 2
    assert count_rows(spark, data=df) == 2  # non-string passes through


def test_lookup_semantics(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    items = spark.createDataFrame([(1,), (3,)], "k long")
    got = {r["k"] for r in lookup(df, items, key="k").collect()}
    assert got == {1, 3}
    missing = spark.createDataFrame([(9,)], "k long")
    with pytest.raises(KeyError):
        lookup(df, missing, key="k")


def test_order_by_key_list(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    out = [r["k"] for r in order_by_key_list(df, ["c", "a"], key="k").collect()]
    assert out == ["c", "a"]


def test_binary_file_source(spark, tmp_path):
    """asnpbytearray analog (numpy.py:75-124): opaque file bytes arrive as
    a BinaryType content column via the binaryFile source."""
    raw = tmp_path / "blob.bin"
    raw.write_bytes(b"\x00\x01\x02payload")
    df = load(spark, str(raw))
    row = df.select("content", "length").first()
    assert bytes(row["content"]) == b"\x00\x01\x02payload"
    assert row["length"] == 10


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key -> the physical plan contains
    no Exchange: the co-located join contract at scale."""
    import io, contextlib

    from epic_pandas_spark.sources.io import write_bucketed

    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    from epic_pandas_spark.session import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=4)
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=4)
    # disable broadcast so the planner must choose between shuffle and
    # bucket-co-located SMJ — the scale scenario (neither side broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes(spark, tmp_path):
    """Hive-partitioned dump + a predicate on the partition column must
    prune directories (PartitionFilters), not just row-filter."""
    from epic_pandas_spark.plans.inspect import physical_plan
    from epic_pandas_spark.session import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_part.parquet")
    dump(orders, out, partition_by=["o_orderstatus"])
    back = load(spark, out).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() > 0
