"""Custom stateful streaming operators via applyInPandasWithState — the
escape hatch for stream semantics Spark's built-in windows can't express
(running per-key aggregates that must emit on every batch, cross-batch
counters, custom eviction).

State shape discipline for scale: state per key is O(1) (a few counters),
so a 1000-executor cluster holds |keys| × bytes-per-counter — never raw
events. Keys shuffle once into the state store partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key cumulative (n_events, sum_value) emitted after every batch —
    a running counter that survives across micro-batches in the state
    store. Output rows carry the totals as-of the latest batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "sum_value": [total]})

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"{key_col} long, n_events long, sum_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_running_totals(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Batch twin of running_totals' final state: plain groupBy totals."""
    from pyspark.sql import functions as F

    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value")
    )


def running_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """`running_totals` on the transformWithStateInPandas API (Spark 4's
    successor to applyInPandasWithState): identical semantics — per-key
    cumulative (n_events, sum_value) emitted each batch — but state lives
    in named, individually-evolvable ValueState handles instead of one
    opaque tuple, and the processor object carries init/close lifecycle
    hooks. Same scale shape: O(1) state per key, one shuffle into the
    state-store partitioning. Stream==batch equivalence is tested against
    the same `batch_running_totals` twin.

    Runtime dependency: the transformWithState protocol serializes state
    over protobuf — `google.protobuf` must be importable on driver and
    executors (raises ImportError here otherwise; the
    applyInPandasWithState implementation above has no such dependency
    and is the drop-in fallback)."""
    try:
        import google.protobuf  # noqa: F401 — the TWS wire protocol needs it
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf at runtime; "
            "use running_totals (applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "sum_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=f"{key_col} long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def windowed_topk(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "event_type",
    window_size: str = "1 hour",
    k: int = 10,
    m: int = 64,
) -> DataFrame:
    """Streaming heavy hitters per event-time window via SPACE-SAVING
    (Metwally et al., ICDT'05) — the bounded-state answer to "what are
    the top-k values in each window" on a stream whose per-window value
    cardinality is unbounded. An exact windowed top-k would hold one
    counter PER DISTINCT VALUE per open window (state grows with the
    stream's vocabulary: URLs, user ids, query strings); Space-Saving
    holds exactly ``m`` (value, count, err) counters per window and
    guarantees (a) every value with true count > N/m is present, and
    (b) ``count - err <= true <= count`` per counter — so the emitted
    top-k is exact whenever a window's distinct values fit in ``m``,
    and explicitly error-bounded (the ``err`` column) when they don't.

    Construction: group by the FLOORED event-time window start (a
    deterministic column, so the state store shuffles each window's
    rows to one partition exactly like a native window aggregate),
    merge each micro-batch's pandas value counts into the counter set
    (per-batch order: count desc, then value — deterministic across
    reruns), evict the min-count counter on overflow with the standard
    count = min+w, err = min inheritance, and emit the current top-k
    per update. State per open window is m triples regardless of rate.

    Batch frames run the same merge in one pass (state machinery
    compiles away conceptually; exactness conditions identical) via
    :func:`batch_windowed_topk` — use that twin for the stream==batch
    equivalence check. Output: (window_start, rank, value, count_est,
    err) with rank 1..k by (count desc, value)."""
    from pyspark.sql import functions as F

    if k < 1 or m < k:
        raise ValueError(f"need 1 <= k <= m, got k={k} m={m}")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        values, counts, errs, n_seen = (
            state.get if state.exists else ([], [], [], 0)
        )
        ctr = {v: (int(c), int(e)) for v, c, e in zip(values, counts, errs)}
        for pdf in pdfs:
            vc = pdf[value_col].dropna().astype(str).value_counts()
            n_seen += int(vc.sum())
            # deterministic merge order: weight desc, then value
            _spacesaving_merge(ctr, sorted(vc.items(), key=lambda t: (-t[1], t[0])), m)
        state.update((
            [v for v in ctr],
            [ctr[v][0] for v in ctr],
            [ctr[v][1] for v in ctr],
            n_seen,
        ))
        top = sorted(ctr.items(), key=lambda t: (-t[1][0], t[0]))[:k]
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "value": [v for v, _ in top],
                "count_est": [c for _, (c, _) in top],
                "err": [e for _, (_, e) in top],
                "n_seen": [n_seen] * len(top),
            }
        )

    win = F.window(ts_col, window_size).getField("start").alias("__win")
    return (
        events.select(win, F.col(value_col))
        .groupBy("__win")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "window_start timestamp, rank int, value string, "
                "count_est long, err long, n_seen long"
            ),
            stateStructType=(
                "values array<string>, counts array<long>, errs array<long>, "
                "n_seen long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _spacesaving_merge(ctr: dict, weighted_items, m: int) -> dict:
    """Merge (value, weight) pairs into a Space-Saving counter dict
    ``{value: (count, err)}`` holding at most ``m`` entries, in the
    given order. Overflow evicts the min-count counter ((count, value)
    min, so the KEPT set is deterministic) and the newcomer inherits
    count = min + w, err = min — the invariant that keeps
    ``count - err <= true <= count`` per counter and every value with
    true count > N/m inside the sketch. Mutates and returns ``ctr``."""
    for v, w in weighted_items:
        w = int(w)
        if v in ctr:
            c, e = ctr[v]
            ctr[v] = (c + w, e)
        elif len(ctr) < m:
            ctr[v] = (w, 0)
        else:
            mv = min(ctr, key=lambda x: (ctr[x][0], x))
            mc = ctr[mv][0]
            del ctr[mv]
            ctr[v] = (mc + w, mc)
    return ctr


def batch_windowed_topk(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "event_type",
    window_size: str = "1 hour",
    k: int = 10,
) -> DataFrame:
    """Exact batch twin of :func:`windowed_topk`'s final emission: per
    event-time window, the top-k values by count with the same
    (count desc, value) tie-break and err = 0 — equal to the streaming
    sketch whenever each window's distinct values fit in its m
    counters (Space-Saving is exact below saturation)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    counts = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.window(ts_col, window_size).getField("start").alias("window_start"),
            F.col(value_col).cast("string").alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("count_est"))
    )
    w = W.partitionBy("window_start").orderBy(
        F.col("count_est").desc(), F.col("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "window_start",
            F.col("rank").cast("int").alias("rank"),
            "value",
            "count_est",
            F.lit(0).cast("long").alias("err"),
        )
    )
