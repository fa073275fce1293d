"""Window-function operators (SURVEY.md §2.5).

The reference's windowing is implicit: cumsum+diff for largest-remainder
allocation (/root/reference/epic/pandas/utils.py:268-271), zero-copy strided
array segmentation `split_with_overlap` (numpy.py:185-241), and 1-D Gaussian
smoothing (algorithm.py:71-92). Here each is an explicit Spark window or a
higher-order array expression — all inside whole-stage codegen, one shuffle
on the partition key at most.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _window(partition_by: Sequence[str] | None, order_by: Sequence[str]):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*[F.col(c) for c in order_by])


def cumsum(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Running total (utils.py:268: `.cumsum()`). Partitioned windows scale
    linearly; an unpartitioned running total funnels through one partition —
    callers should partition whenever the data is keyed."""
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col or f"{col}_cumsum", F.sum(F.col(col)).over(w))


def diff(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Lag-1 difference (utils.py:271: `.diff()`); first row per partition
    yields null, matching pandas."""
    w = _window(partition_by, order_by)
    return df.withColumn(out_col or f"{col}_diff", F.col(col) - F.lag(F.col(col), 1).over(w))


def gaussian_kernel(sigma: float, truncate: float = 4.0) -> list[float]:
    """Normalized 1-D Gaussian kernel, radius = truncate*sigma rounded up —
    the same kernel scipy's gaussian_filter1d builds (algorithm.py:71-92
    delegates to scipy). Pure driver-side math."""
    radius = int(truncate * sigma + 0.5)
    ks = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-radius, radius + 1)]
    s = sum(ks)
    return [k / s for k in ks]


def smooth_with_gaussian(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    sigma: float = 1.0,
    truncate: float = 4.0,
    out_col: str | None = None,
) -> DataFrame:
    """Gaussian-weighted moving average over an ordered sequence
    (algorithm.py:71-92). Edge handling: weights renormalize over the
    in-bounds neighbors (truncated-kernel normalization) — deterministic
    and oracle-expressible, unlike scipy's default reflect padding
    (documented deviation).

    Implemented as Σ w_i·lag/lead(x,i) with explicit per-offset terms:
    stays in codegen, single shuffle on the partition key.
    """
    kernel = gaussian_kernel(sigma, truncate)
    radius = len(kernel) // 2
    w = _window(partition_by, order_by)

    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for i, wt in enumerate(kernel):
        off = i - radius
        if off < 0:
            neighbor = F.lag(F.col(col), -off).over(w)
        elif off > 0:
            neighbor = F.lead(F.col(col), off).over(w)
        else:
            neighbor = F.col(col)
        num = num + F.coalesce(neighbor * F.lit(wt), F.lit(0.0))
        den = den + F.when(neighbor.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return df.withColumn(out_col or f"{col}_smooth", num / den)


def split_with_overlap(
    df: DataFrame,
    array_col: str,
    length: int,
    overlap: int = 0,
    partials: bool = False,
) -> DataFrame:
    """Fixed-length overlapping segments of an array column — the
    reference's zero-copy strided view (numpy.py:185-241, as_strided at
    230-235) re-expressed as a higher-order `transform` + `slice` over a
    start-offset sequence; `posexplode` yields (seg_idx, segment) rows.

    ``partials=False`` drops trailing segments shorter than ``length``
    (the reference masks them; numpy.py:214-223).

    No Python execution: sequence/slice/explode are all codegen
    expressions, and explode is pipeline-parallel (no shuffle).
    """
    if not 0 <= overlap < length:
        raise ValueError("need 0 <= overlap < length")
    skip = length - overlap
    arr = F.col(array_col)
    n = F.size(arr)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(skip))
    segments = F.transform(starts, lambda s: F.slice(arr, s, length))
    if not partials:
        segments = F.filter(segments, lambda seg: F.size(seg) == length)
    return df.select(
        *df.columns, F.posexplode(segments).alias("seg_idx", "segment")
    )


def even_slices(
    df: DataFrame,
    n_slices: int,
    order_by: Sequence[str],
    out_col: str = "slice_id",
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """`gen_slices` (numpy.py:244-294): partition [0,n) rows into
    n_slices contiguous, remainder-balanced batches. In Spark, physical
    batching IS partitioning (`repartition`), so this exists only for when
    explicit batch ids are semantically required — F.ntile replicates the
    even-with-remainder-spread split exactly.

    ``partition_by=None`` is the reference's single-sequence semantic and
    funnels every row through one ordered window partition — fine at
    driver-ish sizes, a scale-killer beyond that. At scale pass
    ``partition_by`` (a shard column): each shard is sliced independently
    with one shuffle on the shard key and no global sort."""
    if n_slices < 1:
        raise ValueError("n_slices must be >= 1")
    w = _window(partition_by, order_by)
    return df.withColumn(out_col, F.ntile(n_slices).over(w) - 1)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    out_col: str = "bin_id",
) -> DataFrame:
    """Greedy contiguous sequence packing for training-batch assembly:
    rows (documents), taken in ``order_by`` order, are packed into bins of
    ~``budget`` tokens via a running total — bin id = floor((preceding
    running total - own tokens) / budget). One window pass, no Python.

    ``partition_by=None`` packs the whole frame as one sequence (the
    semantic spec; single ordered partition — small inputs only). At 100 TB
    pass a shard column: packing is only ever required within a shard, and
    the per-shard form shuffles once on the shard key, scales linearly,
    and emits no single-partition window warnings."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    running = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(out_col, F.floor(running / F.lit(float(budget))).cast("long"))


def rolling_agg(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    window: int,
    partition_by: Sequence[str] | None = None,
    agg: str = "avg",
    out_col: str | None = None,
    min_periods: int = 1,
) -> DataFrame:
    """pandas-style trailing rolling aggregate over the previous ``window``
    rows (inclusive): rolling(window).mean()/sum()/min()/max() — absent
    from the reference itself but part of the pandas surface its users
    live on. rowsBetween(-(window-1), 0) keeps it a streaming window:
    one shuffle on the partition key, no buffering beyond the frame."""
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}
    if agg not in fns:
        raise ValueError(f"agg must be one of {sorted(fns)}")
    w = _window(partition_by, order_by).rowsBetween(-(window - 1), 0)
    value = fns[agg](F.col(col)).over(w)
    if min_periods > 1:
        n = F.count(F.col(col)).over(w)
        value = F.when(n >= min_periods, value)
    return df.withColumn(out_col or f"{col}_rolling_{agg}", value)


def ffill(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill nulls with the last observed value (pandas
    fillna(method='ffill')): ignorenulls last() over an unbounded-preceding
    frame — streams within each key partition."""
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col or col, F.last(F.col(col), ignorenulls=True).over(w))


def bfill(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Backward-fill: first observed value ahead (fillna(method='bfill'))."""
    w = _window(partition_by, order_by).rowsBetween(0, Window.unboundedFollowing)
    return df.withColumn(out_col or col, F.first(F.col(col), ignorenulls=True).over(w))


def interpolate_linear(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of interior nulls by row position (pandas
    interpolate(method='linear')): for each null run, blend the previous
    and next observed values by fractional distance. Built from four
    windows (prev/next value + row-number bookkeeping) — no UDF, one
    shuffle on the partition key. Leading nulls stay null; trailing nulls
    carry the last value forward (pandas limit_direction='forward'
    default)."""
    w_all = _window(partition_by, order_by)
    w_back = w_all.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = w_all.rowsBetween(0, Window.unboundedFollowing)
    rn = F.row_number().over(w_all)
    prev_v = F.last(F.col(col), ignorenulls=True).over(w_back)
    next_v = F.first(F.col(col), ignorenulls=True).over(w_fwd)
    rn_of_obs = F.when(F.col(col).isNotNull(), rn)
    prev_rn = F.last(rn_of_obs, ignorenulls=True).over(w_back)
    next_rn = F.first(rn_of_obs, ignorenulls=True).over(w_fwd)
    frac = (rn - prev_rn).cast("double") / (next_rn - prev_rn).cast("double")
    filled = (
        F.when(F.col(col).isNotNull(), F.col(col))
        .when(prev_v.isNull(), F.lit(None))  # leading nulls
        .when(next_v.isNull(), prev_v)  # trailing nulls carry forward
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out_col or col, filled)


def rolling_time_agg(
    df: DataFrame,
    col: str,
    ts_col: str,
    window_seconds: int,
    partition_by: Sequence[str] | None = None,
    agg: str = "avg",
    out_col: str | None = None,
) -> DataFrame:
    """Trailing TIME-range rolling aggregate: all rows within
    [t - window_seconds, t] per key (closed interval — SQL RANGE frame
    semantics; pandas rolling("7D") is left-open by one tick). The frame
    is `rangeBetween` over epoch microseconds, so unlike the row-count
    form (`rolling_agg`) the frame width follows event density — the
    7-day-revenue-per-user shape. One shuffle on the partition key; the
    range frame streams within each partition."""
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}
    if agg not in fns:
        raise ValueError(f"agg must be one of {sorted(fns)}")
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    base = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    w = base.orderBy(
        F.unix_micros(F.col(ts_col).cast("timestamp"))
    ).rangeBetween(-window_seconds * 1_000_000, 0)
    value = fns[agg](F.col(col)).over(w)
    return df.withColumn(out_col or f"{col}_rolling_{agg}", value)


def global_cumsum(
    df: DataFrame,
    col: str,
    order_by: str,
    out_col: str | None = None,
) -> DataFrame:
    """GLOBAL running total without the single-partition window funnel:
    ``cumsum`` above documents that an unpartitioned window moves every
    row to one task — this is the scale path for a truly global
    cumulative sum over a total order (``order_by`` values must be
    unique, e.g. a distinct-key aggregate; ties would make the running
    total order-dependent). One column; see :func:`global_cumsums` for
    the shared-pass multi-column form callers should prefer when they
    need several prefixes over the same order (ROC/AP compute np and nn
    together — round 11 halved their range shuffles this way)."""
    return global_cumsums(df, [col], order_by, out_cols=[out_col or f"{col}_cumsum"])


def global_cumsums(
    df: DataFrame,
    cols: list[str],
    order_by: str,
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Multi-column :func:`global_cumsum`: ALL listed columns get their
    global running total in ONE pass — one range shuffle, one pinned
    layout, one bounded per-partition-totals job, one Arrow stamp —
    where N chained single-column calls would pay N of each.

    Same two-job shape as ``zip_with_index`` (keyed.py), generalized
    from counts to sums: range-partition + sort by ``order_by`` and PIN
    the layout (eager localCheckpoint — both jobs must observe identical
    partitions), one bounded job collects the per-partition SUM of every
    column (a few longs per task), cumulative offsets broadcast, and a
    ``mapInArrow`` pass stamps ``offset + local running total`` per
    batch. Rows never funnel through one task and never leave Arrow."""
    import numpy as np
    import pyarrow as pa
    from pyspark import TaskContext
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if not cols:
        raise ValueError("cols must be non-empty")
    out_cols = out_cols or [f"{c}_cumsum" for c in cols]
    if len(out_cols) != len(cols):
        raise ValueError("out_cols must match cols")
    t = (
        df.repartitionByRange(F.col(order_by))
        .sortWithinPartitions(order_by)
        .localCheckpoint(eager=True)
    )
    totals = (
        t.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(*[F.sum(F.col(c)).alias(f"__s{i}") for i, c in enumerate(cols)])
        .collect()  # bounded: one row per partition
    )
    offsets: dict[int, list[float]] = {}
    acc = [0] * len(cols)
    for r in sorted(totals, key=lambda row: row["__pid"]):
        offsets[r["__pid"]] = list(acc)
        for i in range(len(cols)):
            acc[i] += r[f"__s{i}"] or 0
    off_b = t.sparkSession.sparkContext.broadcast(offsets)

    dtypes = dict(t.dtypes)
    integral = [
        dtypes[c] in ("bigint", "int", "smallint", "tinyint") for c in cols
    ]
    fields = [
        StructField(oc, LongType() if ig else DoubleType(), True)
        for oc, ig in zip(out_cols, integral)
    ]
    out_schema = StructType([*t.schema.fields, *fields])
    out_names = [f.name for f in out_schema.fields]
    np_types = [np.int64 if ig else np.float64 for ig in integral]
    pa_types = [pa.int64() if ig else pa.float64() for ig in integral]
    col_idxs = [t.columns.index(c) for c in cols]
    zeros = [0] * len(cols)

    def stamp(batches):
        import pyarrow.compute as pc

        part_off = off_b.value.get(TaskContext.get().partitionId(), zeros)
        runs = [np_types[i](part_off[i]) for i in range(len(col_idxs))]
        for batch in batches:
            stamped = []
            for i, ci in enumerate(col_idxs):
                # nulls contribute 0 to the running total (SUM semantics)
                vals = pc.fill_null(batch.column(ci), 0).to_numpy(
                    zero_copy_only=False
                )
                cs = np.cumsum(vals.astype(np_types[i])) + runs[i]
                if len(cs):
                    runs[i] = cs[-1]
                stamped.append(pa.array(cs, type=pa_types[i]))
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, *stamped], names=out_names
            )

    return t.mapInArrow(stamp, out_schema)
