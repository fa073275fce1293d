"""Physical-plan inspection helpers — the audit tooling behind the
"would this survive 100×?" checks (README scale notes). Used by tests to
ASSERT plan shape, not just observe it."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    # formatted mode prints the operator name ("(4) Exchange") apart from
    # its partitioning arguments, so count operator headers
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def join_strategies(df: DataFrame) -> list[str]:
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)",
        physical_plan(df),
    )


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: ([^\n]*)", physical_plan(df))


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    requires_broadcast: bool = False,
    forbid_cartesian: bool = True,
) -> None:
    """Raise AssertionError when the physical plan violates the stated
    scale contract. Use in tests next to the operator's scale claim."""
    plan = physical_plan(df)
    if max_shuffles is not None:
        n = count_shuffles(df)
        assert n <= max_shuffles, f"{n} shuffles > {max_shuffles}\n{plan}"
    if requires_broadcast:
        assert "BroadcastHashJoin" in plan, plan
    if forbid_cartesian:
        assert "CartesianProduct" not in plan, plan
