"""Plan-shape contracts: assert the physical plans match the scale claims
made in operator docstrings (not just that results are right)."""

from pyspark.sql import functions as F

from epic_pandas_spark.plans.inspect import (
    assert_plan,
    count_shuffles,
    join_strategies,
    pushed_filters,
    read_schemas,
)
from epic_pandas_spark.plans.registry import REGISTRY
from epic_pandas_spark.session import load_table
from tests.conftest import SF_DIR


def test_tpch_q3_broadcasts_dimensions(spark):
    fn, _ = REGISTRY["tpch_q3"]
    df = fn(spark, SF_DIR)
    assert "BroadcastHashJoin" in join_strategies(df)
    assert any("BUILDING" in p for p in pushed_filters(df)), "segment filter must push to scan"


def test_tpch_q1_reads_only_needed_columns(spark):
    fn, _ = REGISTRY["tpch_q1"]
    schemas = read_schemas(fn(spark, SF_DIR))
    assert schemas, "no scan found"
    # 6 of lineitem's 11 columns are needed; the scan must not read more
    assert all(s.count(",") <= 6 for s in schemas), schemas


def test_value_counts_single_shuffle(spark):
    fn, _ = REGISTRY["value_counts"]
    df = fn(spark, SF_DIR)
    # one hash-agg shuffle of base data + one single-partition exchange of
    # the already-aggregated histogram (|distinct| rows) for the fraction
    # window — and critically only ONE scan of the base table
    assert count_shuffles(df) <= 2
    assert len(read_schemas(df)) == 1  # exactly one scan of the base table


def test_upsert_plan_contract(spark):
    fn, _ = REGISTRY["upsert"]
    assert_plan(fn(spark, SF_DIR), requires_broadcast=True)


def test_exact_dedup_shuffles_fingerprint_not_text(spark):
    from epic_pandas_spark.extensions.dedup import exact_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    df = exact_dedup(docs, "text", "doc_id")
    assert count_shuffles(df) == 1
