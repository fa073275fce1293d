"""Structured Streaming operators (SURVEY.md §2.10: absent from the
reference — this is the extension layer's stream story, built entirely on
Spark's native streaming state).

Each operator here is the streaming twin of a batch registry query, built
so the SAME transformation function applies to a batch DataFrame or a
readStream DataFrame (Structured Streaming's core design). Tests drive
them with a file source and a memory sink, `processAllAvailable()` making
the run synchronous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    by: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time aggregation with late-data watermark: counts and
    value sums per (window, keys). On a stream, state per open window is
    dropped once the watermark passes — bounded memory at any scale."""
    keys = by or ["event_type"]
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_size).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time window — each event lands in size/slide windows."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_size, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id stream: duplicates of the same id arriving
    within the watermark window are dropped and state is evicted once the
    watermark passes — `dropDuplicatesWithinWatermark` gives both the
    right semantics (dedup on id alone, not (id, ts)) and bounded state.
    Batch frames fall back to a plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates(id_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: activity periods per user closed by a `gap` of
    silence. Streaming uses the native session_window state; the batch
    twin (plans/registry.q_sessionize) is the classic lag/cumsum plan and
    is oracle-checked — both produce (user, session_start, n_events)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("win"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("session_start"), user_col, "n_events")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: match right rows to left
    rows sharing the key columns with ``right_ts`` inside
    ``[left_ts, left_ts + max_delay]`` — the attribution-style join
    (click→conversion, request→response).

    On streams, both sides get the watermark and the time bound lives in
    the JOIN CONDITION itself — that is what lets Spark compute how long
    buffered rows can possibly still match and evict join state, the
    requirement for a bounded-memory stream-stream join. The identical
    plan runs on batch frames (state machinery compiles away), giving the
    stream==batch equivalence the rest of this module guarantees.

    Right-side non-key columns that collide with left names come back
    prefixed ``r_``."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    rename = {
        c: f"r_{c}" for c in right.columns if c in left.columns and c not in on
    }
    for old, new in rename.items():
        rw = rw.withColumnRenamed(old, new)
    rts = rename.get(right_ts, right_ts)
    cond = None
    for k in on:
        term = lw[k] == rw[k]
        cond = term if cond is None else (cond & term)
    cond = (
        cond
        & (rw[rts] >= lw[left_ts])
        & (rw[rts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicated right-side key columns
    keep = [lw[c] for c in left.columns] + [
        rw[rename.get(c, c)] for c in right.columns if c not in on
    ]
    return joined.select(*keep)


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query synchronously into an in-memory table (the
    test/demo sink). Returns the query handle after all available input is
    processed; caller reads `spark.sql(f"SELECT * FROM {name}")`."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    return q


def stream_to_parquet_exactly_once(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
):
    """foreachBatch sink: per-epoch idempotent parquet writes (partitioned
    by epoch id) + the streaming checkpoint give end-to-end exactly-once
    for replayable sources — the production sink pattern when the target
    lacks native transactional streaming support."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_calibration_bins(
    scored: DataFrame,
    ts_col: str = "ts",
    score_col: str = "score",
    label_col: str = "label",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    n_bins: int = 10,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Calibration-DRIFT monitor: the reliability diagram of a deployed
    scorer per event-time window — ``(window_start, [by...,] bin, n,
    conf, acc, gap)`` — so a model whose probabilities go stale (the
    thing :func:`operators.stats.calibration_bins` measures offline) is
    caught while it is drifting, not at the next offline eval. Feed it
    the scored stream joined with arriving labels.

    ``by`` adds grouping columns (e.g. language, domain): a model
    drifting on ONE segment is invisible in the aggregate diagram —
    the per-group twin of :func:`operators.stats.grouped_calibration`.

    ONE stateful aggregate on (event-time window, [by...,] bin) — state
    per open window is n_bins rows of four numbers PER GROUP regardless
    of stream rate (bounded by |groups| x n_bins, not by volume), and
    the watermark drops closed windows, so memory is bounded at any
    scale; the per-window ECE/Brier scorecard is a trivial rollup of
    the emitted diagram (|windows| x |groups| x n_bins rows), done
    wherever the monitor lands. Runs identically on a batch frame (the
    stream==batch equivalence test). Null scores/labels are excluded;
    bin semantics match the batch operator (top edge folds into the
    last bin)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    group_cols = [by] if isinstance(by, str) else list(by or [])
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    b = F.least(
        F.floor(s * F.lit(float(n_bins))).cast("int"), F.lit(n_bins - 1)
    )
    src = scored.withWatermark(ts_col, watermark) if scored.isStreaming else scored
    t = (
        src.filter(s.isNotNull() & y.isNotNull())
        .groupBy(
            F.window(ts_col, window_size).alias("win"), *group_cols, b.alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s).alias("__sum_s"),
            F.sum(y).alias("__sum_y"),
        )
    )
    return t.select(
        F.col("win.start").alias("window_start"),
        *group_cols,
        "bin",
        "n",
        (F.col("__sum_s") / F.col("n")).alias("conf"),
        (F.col("__sum_y") / F.col("n")).alias("acc"),
        ((F.col("__sum_y") - F.col("__sum_s")) / F.col("n")).alias("gap"),
    )


def windowed_distinct_approx(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    lg_k: int = 12,
) -> DataFrame:
    """Approximate distinct values per event-time window via a mergeable
    HLL sketch aggregate (operators.sketches family) — the streaming form
    of exact count-distinct, which would otherwise hold every seen value
    in state. Here each open window's state is ONE ~2^lg_k-byte sketch
    regardless of stream cardinality, sketches merge associatively across
    micro-batches, and the watermark drops closed-window state. Works
    identically on a batch frame (the stream==batch equivalence test)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_size).alias("win"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(value_col, F.lit(lg_k))
            ).alias("approx_distinct")
        )
        .select(F.col("win.start").alias("window_start"), "approx_distinct")
    )
