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

from pyspark.sql import Column, DataFrame, Window, functions as F


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
    replace: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Sample min(n, len) rows exactly (or min(frac,1.0) of rows), without
    replacement; optional column-weighted sampling. ``replace=True`` draws
    exactly n multinomial samples WITH replacement (n may exceed the row
    count), reference parity with utils.py:557-608's ``replace`` branch.

    Exact-n without replacement uses the A-ES reservoir ordering: key each
    row by -log(u)/w (u uniform, w weight; w=1 unweighted reduces to a
    plain random permutation) and take the global top-n. The top-n is a
    `orderBy().limit(n)` which Spark executes as per-partition partial
    top-n + a single merge of n·P candidates — no global sort of the data.

    With replacement delegates to `sample_with_replacement` (draw-side
    inverse-CDF; no global window, draws broadcast to the corpus scan).
    """
    if (n is None) == (frac is None):
        raise ValueError("exactly one of n / frac")
    if frac is not None:
        # pandas frac-sampling returns EXACTLY round(frac*len) rows
        # (utils.py:557-608 delegates to DataFrame.sample) — so resolve to
        # the exact-n path; the count is one aggregate job
        if weights is not None:
            raise ValueError("weights require n=, matching the exact-n path")
        if not replace:
            frac = min(frac, 1.0)
        n = int(round(frac * df.count()))
    if replace:
        return sample_with_replacement(df, n, weights=weights, seed=seed)
    u = _rand_col(df, seed)
    if weights is None:
        key = u
    else:
        w = F.col(weights).cast("double")
        key = F.when(w > 0, -F.log(u) / w).otherwise(F.lit(float("inf")))
    return df.withColumn("__sk", key).orderBy(F.col("__sk").asc()).limit(n).drop("__sk")


def _two_phase_positions(df: DataFrame, weights: str | None, seed: int, n_parts: int = 256):
    """Per-row half-open position intervals [lo, hi) on the cumulative
    weight line [0, W), without a global window: rows are hashed into
    ``n_parts`` pseudo-partitions, the cumulative sum runs per partition
    (parallel windows), and the |n_parts| partition offsets are collected
    driver-side (tiny) and joined back via a broadcast. Unweighted rows
    get unit width, so positions are the dense indexes 0..N-1.

    Returns (frame with __lo/__hi, total weight W)."""
    w = (
        F.col(weights).cast("double")
        if weights is not None
        else F.lit(1.0)
    )
    h = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    part = F.pmod(h, F.lit(n_parts))
    base = df.withColumn("__w", w).filter(F.col("__w") > 0)
    base = base.withColumn("__part", part).withColumn("__h", h)
    base = base.localCheckpoint(eager=False)  # read once for offsets, once for join
    offsets_rows = (
        base.groupBy("__part").agg(F.sum("__w").alias("__pw")).collect()
    )
    part_w = {int(r["__part"]): float(r["__pw"]) for r in offsets_rows}
    cum = 0.0
    part_off = {}
    for p in sorted(part_w):
        part_off[p] = cum
        cum += part_w[p]
    total = cum
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(p, o) for p, o in part_off.items()], "__part long, __off double"
        )
    )
    order = Window.partitionBy("__part").orderBy(F.col("__h").asc())
    pw = order.rowsBetween(Window.unboundedPreceding, 0)
    # __lo via lag(__hi) (not __hi - w): adjacent intervals share the exact
    # fp boundary value, so a draw can never fall in an ulp gap/overlap.
    # Unweighted (unit widths) this is exact integer arithmetic end-to-end.
    positioned = (
        base.join(off_df, on="__part", how="inner")
        .withColumn("__hi", F.col("__off") + F.sum("__w").over(pw))
        .withColumn("__lo", F.coalesce(F.lag("__hi").over(order), F.col("__off")))
    )
    return positioned, total


def sample_with_replacement(
    df: DataFrame,
    n: int,
    weights: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n`` multinomial draws WITH replacement (optionally
    weighted), deterministic under any partitioning.

    Inverse-CDF on the draw side: each draw j gets a hash-derived uniform
    target t_j in [0, W); the selected row is the one whose cumulative
    weight interval [lo, hi) contains t_j. The interval table comes from
    `_two_phase_positions` (no global window); the candidate join keys on
    equal-width CDF buckets — each row spans ceil(w_i/bucket)+1 buckets
    (≈1 for non-degenerate weights), each draw exactly one — and the
    aggregated draw table (≤ n rows) is broadcast, so the corpus is
    scanned once with a map-side join and never shuffled. Output rows
    repeat per their draw multiplicity; a `__draw_id` column preserves
    which draw produced each row."""
    if n < 0:
        raise ValueError("n must be >= 0")
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [], df.schema
        ).withColumn("__draw_id", F.lit(0).cast("long"))
    positioned, total = _two_phase_positions(df, weights, seed)
    if total <= 0:
        raise ValueError("cannot sample with replacement from an empty frame")
    n_buckets = max(1, min(1 << 16, n * 4))
    bucket_w = total / n_buckets
    draws = spark.range(n).select(
        F.col("id").alias("__draw_id"),
        F.least(
            (
                ((F.xxhash64("id", F.lit(seed + 1)).cast("double") / F.lit(float(2**64))) + F.lit(0.5))
                * F.lit(total)
            ),
            # u < 1 guarantees t < W mathematically; the clamp guards the
            # one-in-2^52 fp rounding of u*W up to exactly W
            F.lit(total * (1.0 - 1e-15)),
        ).alias("__t"),
    )
    draws = draws.withColumn(
        "__bucket", F.least(F.floor(F.col("__t") / F.lit(bucket_w)), F.lit(n_buckets - 1)).cast("long")
    )
    rows_b = positioned.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("__lo") / F.lit(bucket_w)).cast("long"),
                F.least(
                    F.floor((F.col("__hi")) / F.lit(bucket_w)).cast("long"),
                    F.lit(n_buckets - 1),
                ),
            )
        ),
    )
    out_cols = [c for c in df.columns]
    return (
        rows_b.join(F.broadcast(draws), on="__bucket", how="inner")
        .filter((F.col("__t") >= F.col("__lo")) & (F.col("__t") < F.col("__hi")))
        .select(*out_cols, "__draw_id")
    )


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


def split_train_val(
    df: DataFrame,
    val_frac: float,
    by: Sequence[str] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation split: tags each row 'train' or
    'val' from a hash of ``by`` (or the whole row) — a pure projection, no
    shuffle, stable under any partitioning and across runs, so the split
    is reproducible on 100 TB without materializing membership tables.

    ``by`` is the leakage boundary: pass the entity key (user id, document
    source, dedup cluster) and every row of an entity lands in the SAME
    split — the group-aware split that keeps eval honest. Expected (not
    exact) fractions, the standard trade for a stateless split."""
    if not (0.0 <= val_frac <= 1.0):
        raise ValueError("val_frac must be in [0, 1]")
    cols = [F.col(c) for c in by] if by else [F.col(c) for c in df.columns]
    u = (F.xxhash64(*cols, F.lit(seed)).cast("double") / F.lit(float(2**64))) + F.lit(0.5)
    return df.withColumn(
        out_col, F.when(u < F.lit(val_frac), F.lit("val")).otherwise(F.lit("train"))
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    seed: int = 42,
    order_by: Column | None = None,
) -> DataFrame:
    """Cap each group's contribution at ``k`` rows — the per-domain/
    per-source quota guard of corpus curation (a handful of giant crawl
    domains must not dominate the mixture). Selection order is a
    deterministic whole-row hash by default (partitioning-invariant,
    reproducible across runs), or pass ``order_by`` to keep e.g. the
    highest-quality rows instead of a random subset.

    One window keyed on the group: hot groups land on one reducer ONLY
    up to the sort — at extreme skew pre-filter with a salted two-phase
    count or feed a quality ``order_by`` so the cap is meaningful
    anyway."""
    if k < 1:
        raise ValueError("k must be >= 1")
    order = (
        order_by
        if order_by is not None
        else F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    )
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    label_col: str,
    k: int = 5,
    pool_size: int = 256,
    oversample: int = 3,
    seed: int = 42,
) -> DataFrame:
    """k negatives per anchor for contrastive training: rows whose
    ``label_col`` differs from the anchor's, drawn deterministically.

    Scale shape: a bounded candidate pool (``pool_size`` rows via
    hash-random sample) is indexed 0..P-1 and broadcast; each anchor
    derives ``k*oversample`` pseudo-random pool indices from
    xxhash64(anchor, draw, seed) and equi-joins them — so the work is
    |anchors| x k*oversample rows against a broadcast dim, never an
    anchors x pool nested-loop join, and results are partitioning-
    invariant. Same-label collisions are filtered and the per-anchor
    window keeps the first k distinct negatives; anchors whose label
    saturates the pool may return fewer (oversample bounds that
    probability)."""
    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    pool = sample_at_most(
        df.select(F.col(id_col).alias("neg_id"), F.col(label_col).alias("neg_label")),
        n=pool_size,
        seed=seed,
    )
    # unpartitioned window is safe here: the frame is bounded by pool_size
    # rows (sample_at_most above), not corpus-sized
    pool = pool.withColumn(
        "__idx", F.row_number().over(Window.orderBy(F.col("neg_id"))) - 1
    )
    p = pool.count()  # bounded by pool_size; one tiny job
    if p == 0:
        raise ValueError("cannot sample negatives from an empty frame")
    m = k * oversample
    draws = (
        df.select(
            F.col(id_col).alias("anchor_id"), F.col(label_col).alias("anchor_label")
        )
        .withColumn("__j", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
        .withColumn(
            "__idx",
            F.pmod(F.xxhash64("anchor_id", "__j", F.lit(seed)), F.lit(p)),
        )
    )
    cand = (
        draws.join(F.broadcast(pool), "__idx")
        .filter(F.col("anchor_label") != F.col("neg_label"))
        .dropDuplicates(["anchor_id", "neg_id"])
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.xxhash64("anchor_id", "neg_id", F.lit(seed)).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("anchor_id", "neg_id", "neg_label")
    )
