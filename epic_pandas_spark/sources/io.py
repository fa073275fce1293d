"""Polymorphic extension-dispatched I/O — the reference's `pdload`/`pddump`
(/root/reference/epic/pandas/utils.py:41-195): pick the format from the file
extension, with per-call option passthrough and an optional type/schema
assertion after load.

Spark-first: `load` returns an UNMATERIALIZED DataFrame (`spark.read.<fmt>`),
so predicate pushdown / column pruning apply downstream — an improvement the
survey calls out to preserve (SURVEY.md §3.1). Pickle/npz formats have no
distributed analog and raise with a documented deviation.
"""

from __future__ import annotations

import functools
import inspect
import os

from pyspark.sql import DataFrame, SparkSession

# extension -> spark format (cf. the handler table at utils.py:46-57 plus the
# dynamic read_<ext> dispatch at utils.py:96-99)
_FORMATS = {
    "parquet": "parquet",
    "pq": "parquet",
    "orc": "orc",
    "csv": "csv",
    "tsv": "csv",
    "json": "json",
    "jsonl": "json",
    "ndjson": "json",
    "txt": "text",
    "idx": "text",  # reference: one-value-per-line index file (utils.py:156-165)
    "avro": "avro",
    "bin": "binaryFile",
}
_UNSUPPORTED = {"pkl", "pklgz", "pklbz2", "npy", "npz", "npzsp"}


def _extension(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lstrip(".").lower()
    return ext


def load(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    expect_columns: list[str] | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` with the format inferred from its extension.

    ``expect_columns`` plays the role of `check_instanceof`
    (utils.py:104-105): a post-load schema assertion — but checked against
    `df.schema`, no materialization.
    """
    ext = fmt or _extension(path)
    if ext in _UNSUPPORTED:
        raise ValueError(
            f"'{ext}' is a single-process pickle/numpy format with no distributed "
            f"analog; store as parquet (documented deviation, SURVEY.md §2.1)"
        )
    spark_fmt = _FORMATS.get(ext)
    if spark_fmt is None:
        raise ValueError(f"no handler for extension {ext!r}")
    if ext == "tsv":
        options.setdefault("sep", "\t")
    if spark_fmt == "csv":
        options.setdefault("header", True)
    reader = spark.read.format(spark_fmt).options(**{k: str(v) for k, v in options.items()})
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if expect_columns is not None:
        missing = set(expect_columns) - set(df.columns)
        if missing:
            raise TypeError(f"loaded frame is missing expected columns: {sorted(missing)}")
    return df


def dump(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write ``df``, format from extension (pddump, utils.py:108-150).
    ``partition_by`` hive-partitions the output so later reads with
    predicates on those columns prune whole directories (PartitionFilters
    in the scan) — the storage-layout half of pushdown."""
    ext = fmt or _extension(path)
    if ext in _UNSUPPORTED:
        raise ValueError(f"'{ext}' has no distributed analog; use parquet/orc/csv/json")
    spark_fmt = _FORMATS.get(ext)
    if spark_fmt is None:
        raise ValueError(f"no handler for extension {ext!r}")
    if ext == "tsv":
        options.setdefault("sep", "\t")
    if spark_fmt == "csv":
        options.setdefault("header", True)  # symmetric with load's default
    writer = df.write.format(spark_fmt).mode(mode).options(**{k: str(v) for k, v in options.items()})
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def autoload(*arg_names: str):
    """Decorator: string-valued named args are auto-loaded into DataFrames
    before the call (reference `@autoload`, utils.py:516-554). The wrapped
    function must accept a SparkSession as its first argument."""

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(spark: SparkSession, *args, **kwargs):
            bound = sig.bind(spark, *args, **kwargs)
            for name in arg_names:
                v = bound.arguments.get(name)
                if isinstance(v, str):
                    bound.arguments[name] = load(spark, v)
            return fn(*bound.args, **bound.kwargs)

        return wrapper

    return deco


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table: later
    equi-joins / aggregations on ``bucket_cols`` between tables bucketed
    the same way run WITHOUT a shuffle — the co-located join strategy for
    repeatedly-joined 100 TB fact tables. (Bucketing requires the table
    catalog, hence saveAsTable, not path writes.)"""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
