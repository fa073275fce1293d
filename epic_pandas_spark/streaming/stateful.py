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
