"""Scale-up probe: replicate the sf0.1 fact tables N× (key-shifted) into a
scratch dir and time the headline queries at 1× and N×, printing a JSON
scaling report. This is the evidence loop behind the "would this survive
100×?" design notes in README.md.

Usage: python scripts/scale_probe.py [factor] [scratch_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epic_pandas_spark.session import get_spark, load_table

PROBE_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "value_counts", "topk_customers", "cumsum_diff",
    "drop_duplicates_keep_first", "sessionize",
    "coo_matmul", "grouped_demean", "rolling_mean",
    # curation tier over the replicated documents table
    "decontamination", "gopher_repetition", "pii_scrub",
    "global_shuffle", "mixture_resample",
    # round-2 additions: near-dup scale paths, retrieval, layout, sketches
    "repeated_passages_winnowed", "dedup_jaccard_prefix", "line_dedup",
    "bm25_topk", "salted_join_revenue", "hll_distinct_rollup",
    "zorder_key_events", "grouped_quantiles",
    # round-3 additions: skew-heavy TPC-H shapes, real multimodal decode
    # paths, bloom-prefiltered membership
    "tpch_q9", "tpch_q18", "multimodal_phash_pairs",
    "multimodal_audio_features", "bloom_prefilter_membership",
]


def extra_ops(spark, sf_dir: str):
    """Operators without a fact-table registry query, probed directly on
    the replicated tables (the registry versions run on the small dims)."""
    from epic_pandas_spark.operators import pack_sequences
    from epic_pandas_spark.operators.sampling import sample_with_replacement

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("shard", F.pmod(F.col("user_id"), F.lit(64)))
        .withColumn("n", (F.col("value") * 10 + 1).cast("long"))
    )
    return {
        "sample_with_replacement": lambda: sample_with_replacement(li, 5000, seed=1),
        "pack_sequences_sharded": lambda: pack_sequences(
            ev, "n", 4096, order_by=["ts", "event_id"], partition_by=["shard"]
        ),
    }


def build(spark, src: str, dst: str, factor: int) -> None:
    shifted = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "events": ["event_id", "user_id"],
        # 10M is a multiple of 25, so the shifted copies keep the same
        # doc_id%25 eval membership in the decontamination probe
        "documents": ["doc_id"],
    }
    for t, key_cols in shifted.items():
        df = load_table(spark, src, t)
        parts = []
        for i in range(factor):
            d = df
            for k in key_cols:
                d = d.withColumn(k, F.col(k) + F.lit(i * 10_000_000))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    for t in ["customer", "supplier", "part", "nation", "region", "embeddings"]:
        load_table(spark, src, t).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from epic_pandas_spark.plans.registry import REGISTRY

    def run(df) -> None:
        # noop sink, like bench.py: materializes every output column;
        # count() would let Catalyst prune projection-only plans
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in PROBE_QUERIES:
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        run(fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    for name, thunk in extra_ops(spark, sf_dir).items():
        t0 = time.perf_counter()
        run(thunk())
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_probe")
    build(spark, src, scratch, factor)
    base = time_queries(spark, src)
    big = time_queries(spark, scratch)
    report = {
        "factor": factor,
        "base_sec": base,
        "scaled_sec": big,
        "ratio": {k: round(big[k] / base[k], 2) if base[k] else None for k in base},
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
