"""Z-order clustered data layout (SURVEY.md §2 extended surface —
net-new; the public multi-dimensional-clustering technique used by
Delta Lake OPTIMIZE ZORDER BY / Iceberg sort orders, after Morton
1966).

A 100 TB scan's cheapest operator is the file it never opens. Parquet
readers skip whole files/row-groups when the predicate falls outside
the footer min/max — but min/max on a SECOND column is useless when
files are laid out by the first. Interleaving the bits of several
columns into one Morton (Z) value and range-partitioning + sorting by
it gives every file a small hyper-rectangle of the key space, so
min/max zonemaps prune on EVERY interleaved column at once.

All integer bit arithmetic — deterministic, engine-portable (the q_z1
probe hash-gates the z-values against a DuckDB replay of the same
shifts), and pure codegen: no UDF, no shuffle beyond the one
repartitionByRange the clustered write inherently needs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "write_zordered"]


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each integer
    column: bit i of column j lands at position ``i * n_cols + j``.
    Callers quantize real domains to integer ranks first (e.g.
    ``ntile`` or epoch buckets); values are clamped into
    [0, 2^bits-1] so a hot outlier cannot scatter the layout and a
    negative rank cannot sign-extend into a garbage interleave. A
    NULL in any column propagates to a NULL z-value (Spark's
    least/greatest would otherwise silently clamp NULL to the
    domain maximum, clustering unkeyed rows into the hottest
    corner); ``repartitionByRange`` then groups NULL-keyed rows
    into their own leading range instead.
    """
    if not cols:
        raise ValueError("z_value: need at least one column")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("z_value: bits * n_cols must fit a signed long")
    n = len(cols)
    cap = F.lit((1 << bits) - 1)
    clamped = [
        F.greatest(F.least(c.cast("bigint"), cap), F.lit(0)) for c in cols
    ]
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(clamped)
        for i in range(bits)
    ]
    z = reduce(lambda a, b: a + b, terms)
    any_null = reduce(lambda a, b: a | b, [c.isNull() for c in cols])
    return F.when(any_null, F.lit(None).cast("bigint")).otherwise(z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    repartitionByRange on the Morton value (one range exchange — the
    shuffle any clustered write pays) + sortWithinPartitions, so each
    output file covers a compact hyper-rectangle and its footer
    min/max prunes point/box predicates on every clustered column.
    The helper column is dropped before write; the layout, not the
    schema, carries the clustering."""
    z = z_value([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
