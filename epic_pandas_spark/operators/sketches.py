"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark's
built-in `hll_sketch_agg` / `hll_union_agg`).

The 100 TB pattern for distinct counts: exact `count(distinct x)` needs a
full shuffle of every distinct value; an HLL sketch is a few KB per
group, composes associatively, and — crucially — PERSISTS. A pipeline
can keep a per-shard/per-day sketch table (like the incremental-dedup
fingerprint store in extensions.dedup) and answer "distinct users this
quarter, per domain" by unioning stored sketches without ever re-reading
the quarter's data. Standard HLL error is ~1.04/sqrt(2^lg_k) relative
(~1.6% at lg_k=12).

All functions stay JVM-side; sketches travel as BinaryType columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def distinct_sketches(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per key group:
    (keys..., sketch binary). Partial aggregation is map-side (sketches
    merge associatively), so the shuffle carries one ~2^lg_k-byte sketch
    per (partition, key), never the values themselves."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge per-group sketches up to a coarser key set (possibly empty
    for a global total) and estimate: (keys..., approx_distinct long).
    This is the sketch-store read path — input can be a persisted sketch
    table spanning many ingest batches; no raw data is touched."""
    grouped = sketches.groupBy(*keys) if keys else sketches.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    )
