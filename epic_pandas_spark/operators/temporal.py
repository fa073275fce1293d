"""Temporal joins Spark has no native operator for — as-of join and
range (interval) join — built as compositions of union/window and
bucketized equi-joins (the preference order of SURVEY.md §4.3: composition
first, never a driver-side loop).

Scale shapes:
- as-of: ONE shuffle on the key; the merge is a per-key ordered window
  (last-non-null carry-forward), which streams — no per-group pandas, no
  nested loop. This is the classic distributed merge_asof.
- range join: the right side's intervals explode to one row per covered
  time bucket, then an equi-join on the bucket prunes the cross product to
  O(|pairs actually close|); a final exact predicate filters bucket
  false-positives. Bucket width trades replication (long intervals) vs
  join selectivity — set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _derive_bucket_seconds(*interval_sides: tuple[DataFrame, str, str]) -> int:
    """Pick a bucket width near the data's typical interval length: the
    MAX over the given sides' median lengths (approx_percentile — one
    tiny agg job per side), clamped to >= 1 s.

    Rationale: bucket ~ median length keeps the explode fan-out at ~2
    copies per typical interval while keeping buckets selective; a fixed
    default (e.g. 86400 s) silently degrades toward all-pairs-per-bucket
    on short-interval data (everything lands in the same few buckets) and
    toward huge fan-out on multi-week intervals. Taking the max across
    sides bounds the LONGER side's replication; the shorter side's rows
    then span at most ~2 buckets each, which costs fan-out, not
    correctness.

    Outlier guard: the width is also lower-bounded by max_length/1024
    (same one agg job), so a single pathological interval — one
    multi-year span in a corpus of minutes — explodes into at most
    ~1025 bucket copies instead of millions. Lossless: coarser buckets
    only admit more candidates into the exact residual. The bound binds
    only when max/median > 1024, i.e. exactly when the outlier exists."""
    best = 1
    for df, start, end in interval_sides:
        length_s = (
            F.unix_micros(F.col(end).cast("timestamp"))
            - F.unix_micros(F.col(start).cast("timestamp"))
        ) / F.lit(1_000_000.0)
        row = df.agg(
            F.percentile_approx(length_s, 0.5).alias("m"),
            F.max(length_s).alias("mx"),
        ).first()
        if row["m"] is not None:
            import math

            floor_outlier = math.ceil((row["mx"] or 0.0) / 1024.0)
            best = max(best, int(max(row["m"], floor_outlier, 1.0)))
    return best


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row per key — pandas
    `merge_asof` semantics with allow_exact_matches, all three
    ``direction`` modes:

    - ``"backward"`` (default): most recent right row with rts <= ts;
    - ``"forward"``: earliest right row with rts >= ts;
    - ``"nearest"``: whichever of the two is closer in time (ties prefer
      the backward match, matching pandas).

    Unmatched left rows keep nulls; ``tolerance`` nulls out matches
    farther than the given window (one-sided for backward/forward; for
    nearest it is applied PER SIDE before picking, matching pandas — an
    out-of-tolerance nearer side loses to an in-tolerance farther one).

    Plan: tag and union both sides, sort within each key partition by
    (ts, side-tiebreak), then carry the right payload across with an
    ignorenulls last()/first() window — backward and forward matches are
    each one window over the union; no join against the quadratic
    (left x right) space ever forms.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward, or nearest")
    keys = [key] if isinstance(key, str) else list(key)  # pandas `by` accepts lists
    rts = right_ts_col or ts_col
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in (*keys, rts)
    ]

    lhs = left.withColumn("__side", F.lit(1))
    for c in vals:
        if c in left.columns:
            raise ValueError(f"value column {c!r} collides with a left column")
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    lhs = lhs.withColumn("__rts", F.lit(None).cast("timestamp"))

    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in vals],
        F.col(rts).alias("__rts"),
    )
    for c in left.columns:
        if c not in (*keys, ts_col):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # backward: right rows sort BEFORE left rows at the same ts and the
    # frame looks back => exact matches allowed
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: right rows sort AFTER left rows at the same ts (side desc:
    # 1 then 0) and the frame looks ahead => exact matches allowed
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cols = list(unioned.columns)
    if direction in ("backward", "nearest"):
        cols += [
            *[F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__mb_{c}") for c in vals],
            F.last("__rts", ignorenulls=True).over(wb).alias("__mbts"),
        ]
    if direction in ("forward", "nearest"):
        cols += [
            *[F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__mf_{c}") for c in vals],
            F.first("__rts", ignorenulls=True).over(wf).alias("__mfts"),
        ]
    out = unioned.select(*cols).filter(F.col("__side") == 1)

    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    tol_us = None if tolerance_seconds is None else int(tolerance_seconds * 1_000_000)
    if direction == "backward":
        picked = {c: F.col(f"__mb_{c}") for c in vals}
        mts = F.col("__mbts")
        within: Column = F.lit(True) if tol_us is None else (us(ts_col) - us("__mbts")) <= tol_us
    elif direction == "forward":
        picked = {c: F.col(f"__mf_{c}") for c in vals}
        mts = F.col("__mfts")
        within = F.lit(True) if tol_us is None else (us("__mfts") - us(ts_col)) <= tol_us
    else:
        db = us(ts_col) - us("__mbts")
        df_ = us("__mfts") - us(ts_col)
        # pandas applies tolerance PER SIDE before picking: a side whose
        # candidate exceeds tol is treated as missing, so the other side
        # can still win even when it is the farther one. A missing side
        # loses the comparison; ties prefer backward (pandas).
        b_ok = F.col("__mbts").isNotNull() if tol_us is None else (
            F.col("__mbts").isNotNull() & (db <= tol_us)
        )
        f_ok = F.col("__mfts").isNotNull() if tol_us is None else (
            F.col("__mfts").isNotNull() & (df_ <= tol_us)
        )
        use_b = b_ok & (~f_ok | (db <= df_))
        picked = {
            c: F.when(use_b, F.col(f"__mb_{c}")).when(f_ok, F.col(f"__mf_{c}"))
            for c in vals
        }
        mts = F.when(use_b, F.col("__mbts")).when(f_ok, F.col("__mfts"))
        within = use_b | f_ok
    keep_left = [c for c in left.columns]
    return out.select(
        *keep_left,
        *[F.when(within, picked[c]).alias(c) for c in vals],
        F.when(within, mts).alias("matched_ts"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals containing them
    (start <= left_ts <= end) via time-bucket pruning: intervals explode
    to their covered buckets, the fact side computes one bucket, and the
    equi-join on the bucket replaces the quadratic theta-join; the exact
    containment filter runs on the pruned pairs only.

    ``bucket_seconds=None`` (default) derives the width from the MEDIAN
    right-interval length (one tiny approx_percentile job) — a fixed
    width degrades toward all-pairs-per-bucket when intervals are much
    shorter than it, and toward explode blow-up when much longer."""
    if bucket_seconds is None:
        bucket_seconds = _derive_bucket_seconds((right, start_col, end_col))
    b = F.lit(bucket_seconds * 1_000_000)

    def us(col: str):
        # interval arithmetic yields TIMESTAMP_NTZ, which unix_micros
        # rejects; normalize (session TZ is pinned UTC so this is lossless)
        return F.unix_micros(F.col(col).cast("timestamp"))

    lb = (us(left_ts) / b).cast("long").alias("__bucket")
    rb_start = (us(start_col) / b).cast("long")
    rb_end = (us(end_col) / b).cast("long")
    exploded = right.select(
        *right.columns, F.explode(F.sequence(rb_start, rb_end)).alias("__bucket")
    )
    contained = (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) <= F.col(end_col))
    if how == "inner":
        joined = left.withColumn("__bucket", lb).join(exploded, on="__bucket", how="inner")
        return joined.filter(contained).drop("__bucket")
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # left: keep every left row exactly once when it matches no interval.
    # A bucket can match while containment fails, so unmatched rows are
    # found by anti-joining on a synthetic row id, not by null-checking.
    tagged = left.withColumn("__rid", F.monotonically_increasing_id()).withColumn("__bucket", lb)
    matches = tagged.join(exploded, on="__bucket", how="inner").filter(contained)
    unmatched = tagged.join(matches.select("__rid"), on="__rid", how="left_anti")
    for c in exploded.columns:
        if c != "__bucket":
            unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(exploded.dtypes)[c]))
    return matches.unionByName(unmatched.select(*matches.columns)).drop("__bucket", "__rid")


def ewma(
    df: DataFrame,
    key_cols: list,
    order_cols: list,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
    max_run_length: int = 900,
) -> DataFrame:
    """Exponentially-weighted moving average per key, pandas
    ``ewm(alpha).mean()`` semantics (adjust=True), as a pure window
    expression via the scaling trick: with w = 1-alpha,

        y_i = Σ_{j<=i} w^(i-j)·v_j / Σ_{j<=i} w^(i-j)
            = cumsum(v_j·w^(-j)) / cumsum(w^(-j))     (the w^i cancels)

    — two cumulative window sums, zero Python and zero extra shuffles
    beyond the per-key window.

    The trade: w^(-j) grows with the series index, so long runs overflow
    double precision: (1/(1-alpha))^j stays finite only to
    j < 1023·log(2)/log(1/(1-alpha)) (alpha=0.5 → 1023, alpha=0.9 →
    ~307). The effective cap is min(``max_run_length``, that
    alpha-derived bound), so larger alphas tighten the guard
    automatically rather than silently yielding inf/NaN. The operator
    COUNTS each key's run and raises past the cap — use
    :func:`ewma_stable` (Arrow-batched recurrence, any length) for
    unbounded series. With alpha = 0.5 every weight is an exact power of
    two, so results are bit-reproducible across engines (the oracle
    query exploits this)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    import math

    # last exponent where (1/(1-alpha))^r is a finite double; keep a small
    # safety margin so num/den stay finite too
    overflow_cap = int(1023 * math.log(2) / math.log(1.0 / (1.0 - alpha))) - 1
    cap = min(max_run_length, overflow_cap)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    r = F.row_number().over(w) - 1
    inv_w = F.pow(F.lit(1.0 / (1.0 - alpha)), r)
    guard = F.when(
        F.max(r).over(Window.partitionBy(*key_cols)) >= cap,
        F.raise_error(
            F.lit(
                f"ewma: a key has more than {cap} rows (max_run_length="
                f"{max_run_length}, alpha-overflow bound {overflow_cap}); "
                "the scaling-trick weights overflow — use ewma_stable"
            )
        ),
    ).otherwise(F.lit(None))
    num = F.sum(F.col(value_col) * inv_w).over(cum)
    den = F.sum(inv_w).over(cum)
    return df.withColumn(out_col, num / den + F.coalesce(guard.cast("double"), F.lit(0.0)))


def ewma_stable(
    df: DataFrame,
    key_cols: list,
    order_cols: list,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """EWMA for unbounded runs: applyInPandas per key, replaying the
    numerically-stable pandas recurrence (`ewm(alpha).mean()`) in event
    order — one shuffle on the key, state O(1) per row. Semantics are
    identical to :func:`ewma` where both apply (equivalence-tested)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    import pandas as pd  # noqa: F401

    out_fields = df.schema.fields
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += f", {out_col} double"

    def per_key(pdf):
        pdf = pdf.sort_values([c for c in order_cols])
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(per_key, schema=schema)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Join two INTERVAL sets on overlap (l_start <= r_end AND r_start <=
    l_end), optionally within equi-keys ``on`` — the interval-interval
    sibling of :func:`range_join` (point-in-interval). Both sides explode
    to their covered time-grid buckets and equi-join on (keys..., bucket)
    instead of forming the quadratic theta-join; the exact overlap filter
    runs on pruned pairs only.

    A pair overlapping k shared buckets would surface k times; instead of
    a distinct shuffle, each pair is emitted ONLY in its first shared
    bucket (`bucket == floor(max(starts)/size)`) — a stateless predicate,
    so the dedup is free. ``bucket_seconds`` should sit near the typical
    interval length: too small multiplies the explode fan-out
    (len/bucket copies per row), too large degrades pruning toward
    all-pairs-per-bucket. ``None`` (default) derives it as the max of the
    two sides' median lengths (two tiny approx_percentile jobs), which
    holds that balance across orders of magnitude of interval length."""
    keys = list(on or [])
    if bucket_seconds is None:
        bucket_seconds = _derive_bucket_seconds(
            (left, left_start, left_end), (right, right_start, right_end)
        )
    b = F.lit(bucket_seconds * 1_000_000)

    def us(col):
        return F.unix_micros(F.col(col).cast("timestamp"))

    def explode_side(df, start, end, prefix):
        lo = (us(start) / b).cast("long")
        hi = (us(end) / b).cast("long")
        return df.select(
            *[F.col(k) for k in keys],
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns if c not in keys],
            F.explode(F.sequence(lo, hi)).alias("__bucket"),
        )

    lx = explode_side(left, left_start, left_end, "l_")
    rx = explode_side(right, right_start, right_end, "r_")
    overlap = (F.col(f"l_{left_start}") <= F.col(f"r_{right_end}")) & (
        F.col(f"r_{right_start}") <= F.col(f"l_{left_end}")
    )
    first_shared = F.col("__bucket") == (
        F.greatest(us(f"l_{left_start}"), us(f"r_{right_start}")) / b
    ).cast("long")
    return (
        lx.join(rx, on=keys + ["__bucket"])
        .filter(overlap & first_shared)
        .drop("__bucket")
    )
