"""Multi-column file layout (Z-order) for scan pruning.

Parquet scans skip whole files/row-groups whose column min/max stats
exclude the predicate. A single-column sort gives perfect pruning on
that column and none on the others; interleaving the bits of several
columns (the Z-order / Morton curve) gives each output file a narrow
hyper-rectangle in the combined key space, so selective filters on ANY
of the participating columns prune most files. This is the layout
strategy behind Delta/Iceberg OPTIMIZE ZORDER, built here from
public primitives: a codegen bit-interleave expression +
repartitionByRange + a per-file-clustered write.

Scaling note: the only driver sync is one min/max aggregate row (two
longs per column) to normalize value ranges; the sort itself is
Spark's range partitioner (sampled split points, fully distributed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def morton_interleave_expr(
    scaled: Sequence[Column], bits: int = 8
) -> Column:
    """Bit-interleave already-scaled non-negative ints (each in
    [0, 2**bits)) into one Z-order key: column j contributes its bit b
    to output bit ``b * len(cols) + j``. Pure shift/and/or expressions —
    whole-stage codegen, no UDF."""
    ncols = len(scaled)
    if ncols < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * ncols > 63:
        raise ValueError(f"bits={bits} over {ncols} cols exceeds a signed long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(scaled):
        x = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), b * ncols + j)
            )
    return z


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8, key_col: str = "__z"
) -> DataFrame:
    """Append the Z-order key for numeric ``cols``: each column is
    min/max-scaled to [0, 2**bits) (one tiny driver-side agg), then
    bit-interleaved. Monotone per column, so per-file key ranges bound
    every participating column's value range."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ).cast("long")
        )
    return df.withColumn(key_col, morton_interleave_expr(scaled, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: range-partition on the interleaved key (distributed,
    sampled split points) and sort within partitions so row groups are
    tight too. Each output file then covers a narrow rectangle of the
    key space and min/max stats prune scans filtered on any of
    ``cols``."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
