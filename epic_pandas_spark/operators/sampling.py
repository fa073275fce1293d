"""Sampling operators — a first-class family in the reference (SURVEY.md §2.9).

- `sample_at_most` (/root/reference/epic/pandas/utils.py:557-608): clamped
  exact-n (or fraction) sampling, optionally weighted.
- `sample_with_distribution` (utils.py:198-278): EXACT stratified sampling —
  per-stratum counts derived from a target distribution by the
  cumsum-round-diff largest-remainder rule (utils.py:267-271), with a
  feasibility check (utils.py:257-264).

Determinism at scale: `F.rand(seed)` is partition-order dependent, so
randomness here derives from ``xxhash64(row-identity, seed)`` — stable
under repartitioning, reproducible across runs, oracle-friendly
(SURVEY.md §7.3 item 2). Exact-n selection is a per-stratum top-k window:
one shuffle on the stratum column. Stratum counts are collected to the
driver — |strata| rows, not data rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _rand_col(df: DataFrame, seed: int, salt: Sequence[str] | None = None) -> F.Column:
    """Deterministic pseudo-random in [0,1): hash of the full row (or the
    given columns) mixed with the seed. Stable under any partitioning."""
    cols = [F.col(c) for c in (salt if salt else df.columns)]
    h = F.xxhash64(*cols, F.lit(seed))
    # map signed 64-bit to [0, 1)
    return (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)


def sample_at_most(
    df: DataFrame,
    n: int | None = None,
    frac: float | None = None,
    weights: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sample min(n, len) rows exactly (or min(frac,1.0) of rows), without
    replacement; optional column-weighted sampling.

    Exact-n uses the A-ES reservoir ordering: key each row by
    -log(u)/w (u uniform, w weight; w=1 unweighted reduces to a plain
    random permutation) and take the global top-n. The top-n is a
    `orderBy().limit(n)` which Spark executes as per-partition partial
    top-n + a single merge of n·P candidates — no global sort of the data.
    """
    if (n is None) == (frac is None):
        raise ValueError("exactly one of n / frac")
    u = _rand_col(df, seed)
    if frac is not None:
        # pandas frac-sampling returns EXACTLY round(frac*len) rows
        # (utils.py:557-608 delegates to DataFrame.sample) — so resolve to
        # the exact-n path; the count is one aggregate job
        if weights is not None:
            raise ValueError("weights require n=, matching the exact-n path")
        frac = min(frac, 1.0)
        n = int(round(frac * df.count()))
    if weights is None:
        key = u
    else:
        w = F.col(weights).cast("double")
        key = F.when(w > 0, -F.log(u) / w).otherwise(F.lit(float("inf")))
    return df.withColumn("__sk", key).orderBy(F.col("__sk").asc()).limit(n).drop("__sk")


def allocate_counts(distribution: dict, n_rows: int) -> dict:
    """Largest-remainder allocation of ``n_rows`` over a normalized
    distribution, exactly the reference's cumsum→round→diff chain
    (utils.py:267-271). Driver-side pure math over |strata| entries."""
    import math

    items = list(distribution.items())
    total = float(sum(v for _, v in items))
    cum = 0.0
    prev = 0
    out = {}
    for k, v in items:
        cum += v / total
        # half-up rounding (not Python's banker's round) so the allocation
        # matches SQL ROUND semantics in the oracle comparison
        cur = int(math.floor(cum * n_rows + 0.5))
        out[k] = cur - prev
        prev = cur
    return out


def sample_with_distribution(
    df: DataFrame,
    population_col: str,
    n_rows: int,
    distribution: dict,
    seed: int = 42,
) -> DataFrame:
    """Exact stratified sample: per-stratum counts from ``distribution``
    via largest remainder, then an exact per-stratum random top-k.

    Feasibility (utils.py:257-264): if any stratum must supply more rows
    than it has, raise ValueError. The check is one aggregation collecting
    |strata| rows to the driver.

    Plan: window rank over partitionBy(stratum) — a single shuffle on the
    population column; skewed strata are split by AQE.
    """
    counts = allocate_counts(distribution, n_rows)
    avail = {
        r["v"]: r["n"]
        for r in df.groupBy(F.col(population_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for stratum, need in counts.items():
        have = avail.get(stratum, 0)
        if need > have:
            raise ValueError(
                f"stratum {stratum!r} needs {need} rows but only has {have} "
                f"(max feasible total: see reference utils.py:257-264)"
            )
    spark = df.sparkSession
    # build the per-stratum quota table with the population column's NATIVE
    # type (a hardcoded string schema would break int/float strata both at
    # createDataFrame time and in the feasibility lookup above)
    pop_type = dict(df.dtypes)[population_col]
    counts_df = F.broadcast(
        spark.createDataFrame(
            [(k, v) for k, v in counts.items()], f"{population_col} {pop_type}, __need long"
        )
    )
    u = _rand_col(df, seed)
    w = Window.partitionBy(population_col).orderBy(F.col("__u").asc())
    return (
        df.withColumn("__u", u)
        .join(counts_df, on=population_col, how="inner")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__need"))
        .drop("__u", "__rn", "__need")
    )
