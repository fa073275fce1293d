"""Custom stateful streaming operators via applyInPandasWithState — the
escape hatch for stream semantics Spark's built-in windows can't express
(running per-key aggregates that must emit on every batch, cross-batch
counters, custom eviction).

State shape discipline for scale: state per key is O(1) (a few counters),
so a 1000-executor cluster holds |keys| × bytes-per-counter — never raw
events. Keys shuffle once into the state store partitioning.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_DURATION_UNITS_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}


def _duration_ms(interval: str) -> int:
    """Parse a Spark-style interval string ('1 hour', '30 minutes') to
    milliseconds — needed to compute a window's close time on the Python
    side of a stateful operator, where Spark's interval parser isn't
    reachable."""
    parts = interval.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"expected '<n> <unit>', got {interval!r}")
    n, unit = parts
    unit = unit.rstrip("s") if unit != "ms" else "millisecond"
    if unit not in _DURATION_UNITS_MS:
        raise ValueError(f"unsupported interval unit in {interval!r}")
    return int(float(n) * _DURATION_UNITS_MS[unit])


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
    watermark: str = "2 hours",
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
    per update. State per open window is m triples regardless of rate,
    and state is BOUNDED OVER TIME too: a streaming input gets
    ``withWatermark(ts_col, watermark)`` and an event-time timeout at
    each window's close, so counters for windows the watermark has
    passed are removed instead of accumulating forever.

    Batch frames run the same merge in one pass (state machinery
    compiles away conceptually; exactness conditions identical) via
    :func:`batch_windowed_topk` — use that twin for the stream==batch
    equivalence check. Output: (window_start, rank, value, count_est,
    err, n_seen) with rank 1..k by (count desc, value); ``n_seen`` is
    the window's running non-null event count (the sketch's N, for
    reading ``err`` against the N/m guarantee — the batch twin omits
    it since its counts are exact)."""
    from pyspark.sql import functions as F

    if k < 1 or m < k:
        raise ValueError(f"need 1 <= k <= m, got k={k} m={m}")
    win_ms = _duration_ms(window_size)
    use_timeout = events.isStreaming

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed this window's close — drop its counters
            state.remove()
            return
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
        if use_timeout:
            _set_window_close_timeout(state, key[0], win_ms)
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

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(ts_col, window_size).getField("start").alias("__win")
    # ts_col rides along un-aggregated: extracting window.start drops the
    # watermark metadata, and event-time timeout requires a watermarked
    # column in the stateful operator's child output (it also lets the
    # engine drop late rows before they reach the state store).
    return (
        src.select(win, F.col(value_col), F.col(ts_col))
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
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if events.isStreaming
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def _window_key_epoch_ms(window_start) -> int:
    """Epoch milliseconds of a grouping-key timestamp, inverting the exact
    conversion PySpark applied on the way in: applyInPandasWithState keys
    go through the non-Arrow ``TimestampType.fromInternal``, i.e.
    ``datetime.fromtimestamp(micros/1e6)`` in the OS-LOCAL timezone
    (``spark.sql.session.timeZone`` does not control this path), so the
    naive key must be read back as OS-local. ``pd.Timestamp(...)
    .timestamp()`` would read it as UTC and shift every close time by the
    host's UTC offset — on a west-of-UTC host that armed timeouts hours
    EARLY, evicting live window state mid-window. ``time.mktime`` is the
    symmetric local-tz inverse, except during a DST fall-back hour, where
    the naive local key is ambiguous (``timetuple()`` yields
    ``tm_isdst=-1`` and mktime guesses the fold): there we resolve the
    fold explicitly by trying both isdst interpretations, keeping those
    whose ``datetime.fromtimestamp`` ROUND-TRIPS back to the key, and
    picking the LATER epoch — fromInternal collapsed two UTC instants
    onto this key, and a late timeout only holds window state one extra
    hour while an early one would evict a live window mid-stream."""
    ts = pd.Timestamp(window_start)
    tt = ts.timetuple()
    naive = ts.replace(microsecond=0, nanosecond=0).to_pydatetime()
    candidates = []
    for isdst in (0, 1):
        try:
            sec = int(time.mktime(tt[:8] + (isdst,)))
        except (OverflowError, OSError, ValueError):
            continue
        if datetime.fromtimestamp(sec) == naive:
            candidates.append(sec)
    sec = max(candidates) if candidates else int(time.mktime(tt))
    return sec * 1000 + ts.microsecond // 1000


def _set_window_close_timeout(state: GroupState, window_start, win_ms: int) -> None:
    """Arm an event-time timeout at this window's close so its state is
    dropped once the watermark passes it. Callers invoke this only under
    EventTimeTimeout with a watermark set (the streaming branch), so both
    GroupState preconditions hold by construction. setTimeoutTimestamp
    rejects timestamps at/behind the current watermark, so a window the
    watermark has already passed gets watermark+1ms and times out on the
    next micro-batch."""
    wm = state.getCurrentWatermarkMs()
    close_ms = _window_key_epoch_ms(window_start) + win_ms
    state.setTimeoutTimestamp(max(close_ms, wm + 1))


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


def windowed_quantiles(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_size: str = "1 hour",
    probs: tuple = (0.5, 0.9, 0.99),
    q: int = 64,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming NUMERIC-DISTRIBUTION drift monitor: per-window
    quantiles of a value stream with bounded state — the third leg of
    the streaming drift tier (calibration bins watch probabilities,
    Space-Saving top-k watches categories, this watches numeric
    distributions: latency, document length, score magnitudes).

    State per open window is at most ``q`` (value, mass) anchors —
    and bounded over time: a streaming input gets
    ``withWatermark(ts_col, watermark)`` plus an event-time timeout at
    each window's close, so anchor sets for watermark-passed windows
    are removed rather than retained forever. The anchor set is the
    streaming form of :func:`operators.sketches.quantile_anchor_sketches`:
    each micro-batch's values merge into the window's anchor set as
    unit masses; past ``q`` entries the merged step function re-anchors
    to ``q`` equal-mass type-1 anchors (values always drawn FROM the
    data, deterministic given arrival order). Exact while a window
    holds <= q values; past that each re-anchoring adds at most
    total_mass/q rank error (so worst case ~batches x N/q, in practice
    one compression per batch on an already-compressed prefix).

    Emits per batch: ``(window_start, prob, quantile_est, n_seen)``
    for each requested prob — the latest emission per window (max
    ``n_seen``) is the window's current estimate. Use
    :func:`batch_windowed_quantiles` as the exact batch twin."""
    from pyspark.sql import functions as F

    if q < 1:
        raise ValueError("q must be >= 1")
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"probs must be in (0, 1], got {p}")
    probs = [float(p) for p in probs]
    win_ms = _duration_ms(window_size)
    use_timeout = events.isStreaming

    def _compress(vals: list, masses: list, q: int) -> tuple:
        """Re-anchor a sorted (value, mass) step function to q type-1
        anchors: anchor j takes the value at cumulative mass
        ceil(j * total / q)."""
        if len(vals) <= q:
            return vals, masses
        total = sum(masses)
        out_v, out_m = [], []
        cum = 0.0
        idx = 0
        prev_t = 0.0
        for j in range(1, q + 1):
            target = total * j / q
            while idx < len(vals) and cum + masses[idx] < target - 1e-9:
                cum += masses[idx]
                idx += 1
            anchor = vals[min(idx, len(vals) - 1)]
            out_v.append(anchor)
            out_m.append(target - prev_t)
            prev_t = target
        return out_v, out_m

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed this window's close — drop its anchors
            state.remove()
            return
        vals, masses, n_seen = (
            state.get if state.exists else ([], [], 0)
        )
        pairs = list(zip(vals, masses))
        for pdf in pdfs:
            new = pdf[value_col].dropna().astype(float)
            n_seen += int(len(new))
            pairs.extend((float(v), 1.0) for v in new)
        pairs.sort(key=lambda t: t[0])
        vals = [v for v, _ in pairs]
        masses = [m for _, m in pairs]
        vals, masses = _compress(vals, masses, q)
        state.update((vals, masses, n_seen))
        if use_timeout:
            _set_window_close_timeout(state, key[0], win_ms)
        total = sum(masses)
        out_p, out_q = [], []
        for p in probs:
            cum = 0.0
            est = vals[-1] if vals else None
            for v, m in zip(vals, masses):
                cum += m
                if cum >= p * total - 1e-9:
                    est = v
                    break
            out_p.append(p)
            out_q.append(est)
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(probs),
                "prob": out_p,
                "quantile_est": out_q,
                "n_seen": [n_seen] * len(probs),
            }
        )

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(ts_col, window_size).getField("start").alias("__win")
    # ts_col kept for the same reason as windowed_topk: the stateful
    # operator needs a watermarked column in its child output for
    # event-time timeout + late-row filtering.
    return (
        src.select(win, F.col(value_col), F.col(ts_col))
        .groupBy("__win")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "window_start timestamp, prob double, quantile_est double, "
                "n_seen long"
            ),
            stateStructType=(
                "vals array<double>, masses array<double>, n_seen long"
            ),
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if events.isStreaming
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def batch_windowed_quantiles(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_size: str = "1 hour",
    probs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact batch twin of :func:`windowed_quantiles`: per event-time
    window, exact type-1 (lower) quantiles at each prob — equal to the
    streaming sketch whenever a window's values fit in its q anchors.
    One shuffle on the window key; per-window rank + count ride the
    same window partitioning."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"probs must be in (0, 1], got {p}")
    v = F.col(value_col).cast("double")
    src = events.filter(v.isNotNull()).select(
        F.window(ts_col, window_size).getField("start").alias("window_start"),
        v.alias("v"),
    )
    w = W.partitionBy("window_start").orderBy("v")
    wn = W.partitionBy("window_start")
    ranked = src.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    # epsilon guard matches the streaming twin's `cum >= p*total - 1e-9`:
    # without it, probs whose double product lands just above an integer
    # (p=0.07, n=100 -> ceil(7.000000000000001)=8) pick rank+1 and break
    # the documented stream==batch equality below q.
    per_p = [
        F.min(
            F.when(
                F.col("__rn")
                >= F.ceil(F.lit(float(p)) * F.col("__n") - F.lit(1e-9)),
                F.col("v"),
            )
        ).alias(f"__q{i}")
        for i, p in enumerate(probs)
    ]
    agg = ranked.groupBy("window_start").agg(
        *per_p, F.max("__n").alias("n_seen")
    )
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(p)).alias("prob"),
                    F.col(f"__q{i}").alias("quantile_est"),
                )
                for i, p in enumerate(probs)
            ]
        )
    ).alias("__s")
    return agg.select("window_start", stack, "n_seen").select(
        "window_start",
        F.col("__s.prob").alias("prob"),
        F.col("__s.quantile_est").alias("quantile_est"),
        "n_seen",
    )
