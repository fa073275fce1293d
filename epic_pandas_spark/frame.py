"""EpicFrame — a thin fluent wrapper bundling the engine's operators, so
code written against the reference's call style ports line-for-line:

    ef = EpicFrame(load(spark, path), key="id")
    ef.value_counts("status").df          # utils.pdload + value_counts
    ef.upsert(delta).sample_at_most(n=100).df

Every method delegates to the module-level operator (the canonical API)
and returns a new EpicFrame over the lazy result — no state, no caching,
nothing hidden: `.df` is always the plain pyspark DataFrame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from epic_pandas_spark import keyed as _keyed
from epic_pandas_spark import operators as _ops
from epic_pandas_spark.keyed import DEFAULT_KEY


class EpicFrame:
    def __init__(self, df: DataFrame, key: str | Sequence[str] = DEFAULT_KEY):
        self.df = df
        self.key = key

    def _wrap(self, df: DataFrame) -> "EpicFrame":
        return EpicFrame(df, self.key)

    # --- §2.4 aggregation ---------------------------------------------------
    def value_counts(self, column: str, **kw) -> "EpicFrame":
        return self._wrap(_ops.value_counts(self.df, column, **kw))

    def column_stats(self, columns=None, **kw) -> "EpicFrame":
        return self._wrap(_ops.column_stats(self.df, columns, **kw))

    def weighted_average(self, data_col: str, weight_col: str, **kw) -> "EpicFrame":
        return self._wrap(_ops.weighted_average(self.df, data_col, weight_col, **kw))

    def unique_row_ids(self, columns=None, **kw) -> "EpicFrame":
        return self._wrap(_ops.unique_row_ids(self.df, columns, **kw))

    # --- §2.3 joins / alignment ---------------------------------------------
    def upsert(self, new: "EpicFrame | DataFrame", **kw) -> "EpicFrame":
        other = new.df if isinstance(new, EpicFrame) else new
        kw.setdefault("key", self.key)
        return self._wrap(_ops.upsert(self.df, other, **kw))

    def reindex(self, target: "EpicFrame | DataFrame") -> "EpicFrame":
        tgt = target.df if isinstance(target, EpicFrame) else target
        return self._wrap(_keyed.reindex(self.df, tgt, key=self.key))

    def alignable(self, other: "EpicFrame | DataFrame") -> bool:
        o = other.df if isinstance(other, EpicFrame) else other
        return _keyed.alignable(self.df, o, key=self.key)

    def lookup(self, items: "EpicFrame | DataFrame", **kw) -> "EpicFrame":
        it = items.df if isinstance(items, EpicFrame) else items
        return self._wrap(_keyed.lookup(self.df, it, key=self.key, **kw))

    # --- §2.2 dedup / nulls ---------------------------------------------------
    def drop_duplicates_by_key(self, **kw) -> "EpicFrame":
        kw.setdefault("key", self.key)
        return self._wrap(_ops.drop_duplicates_by_key(self.df, **kw))

    def fillna(self, value, **kw) -> "EpicFrame":
        return self._wrap(_ops.fillna(self.df, value, **kw))

    def dropna(self, **kw) -> "EpicFrame":
        return self._wrap(_ops.dropna(self.df, **kw))

    def iterrows(self, index: bool = False):
        """Sized driver-side row iterator (reference utils.py:845-877);
        `index=True` keys each row by this frame's key column(s)."""
        from epic_pandas_spark.keyed import iterrows as _iterrows

        return _iterrows(self.df, key=self.key if index else None, index=index)

    # --- §2.9 sampling --------------------------------------------------------
    def sample_at_most(self, n=None, frac=None, **kw) -> "EpicFrame":
        return self._wrap(_ops.sample_at_most(self.df, n=n, frac=frac, **kw))

    def sample_with_distribution(self, population_col: str, n_rows: int, distribution: dict, **kw) -> "EpicFrame":
        return self._wrap(
            _ops.sample_with_distribution(self.df, population_col, n_rows, distribution, **kw)
        )

    # --- §2.5 windows ---------------------------------------------------------
    def cumsum(self, col: str, order_by, **kw) -> "EpicFrame":
        return self._wrap(_ops.cumsum(self.df, col, order_by, **kw))

    def diff(self, col: str, order_by, **kw) -> "EpicFrame":
        return self._wrap(_ops.diff(self.df, col, order_by, **kw))

    def smooth_with_gaussian(self, col: str, order_by, **kw) -> "EpicFrame":
        return self._wrap(_ops.smooth_with_gaussian(self.df, col, order_by, **kw))

    # --- escape hatch ---------------------------------------------------------
    def transform(self, fn, *args, **kw) -> "EpicFrame":
        """Apply any (DataFrame, ...) -> DataFrame operator fluently."""
        return self._wrap(fn(self.df, *args, **kw))

    def __getattr__(self, name):
        # fall through to the underlying DataFrame for select/filter/etc.;
        # DataFrame-returning methods are re-wrapped to stay fluent
        attr = getattr(self.df, name)
        if callable(attr):
            def call(*args, **kw):
                out = attr(*args, **kw)
                return self._wrap(out) if isinstance(out, DataFrame) else out
            return call
        return attr
