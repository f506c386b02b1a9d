"""Column profiling: one-pass data-quality statistics per column.

A curation pipeline's first query against a new 100 TB drop is always
the same: how many rows, which columns are null, what are the ranges,
how many distinct values. This operator computes the whole profile in
ONE aggregation pass and returns it long-form (one row per column) so
it can be stored, diffed between snapshots (sources/cdc.py), and
alerted on.

Output schema (column, n_rows, n_null, n_distinct, min_num, max_num,
min_str, max_str): numeric-ish columns (numbers, timestamps as epoch
micros, booleans) fill the ``_num`` bounds, strings fill the ``_str``
bounds — native-type ordering in both cases; profiling never compares
numbers lexicographically.

Scale posture: a single global aggregate — map-side partial over
every column's expressions in one scan, one 1-row exchange, then a
driver-free explode to long form. Exact distinct counts use Spark's
multi-distinct Expand plan (one extra shuffle keyed by value); for
profiling at extreme widths swap ``exact_distinct=False`` to HLL
``approx_count_distinct`` and the plan collapses back to a single
two-phase agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType,
)


def _as_num(field: T.StructField) -> F.Column | None:
    c = F.col(field.name)
    if isinstance(field.dataType, _NUMERIC):
        return c.cast("double")
    if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c).cast("double")
    if isinstance(field.dataType, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    return None


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """Long-form profile of ``cols`` (default: every scalar column)."""
    fields = [
        f for f in df.schema.fields
        if (cols is None or f.name in cols)
        and not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if not fields:
        raise ValueError("no profilable scalar columns selected")
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, num = F.col(f.name), _as_num(f)
        n = f.name
        distinct = (
            F.countDistinct(c) if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(c).alias(f"__cnt_{n}"),
            distinct.alias(f"__dst_{n}"),
            F.min(num).alias(f"__minn_{n}") if num is not None
            else F.lit(None).cast("double").alias(f"__minn_{n}"),
            F.max(num).alias(f"__maxn_{n}") if num is not None
            else F.lit(None).cast("double").alias(f"__maxn_{n}"),
            (F.min(c) if num is None else F.lit(None).cast("string"))
            .alias(f"__mins_{n}"),
            (F.max(c) if num is None else F.lit(None).cast("string"))
            .alias(f"__maxs_{n}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(f.name).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__cnt_{f.name}")).alias("n_null"),
            F.col(f"__dst_{f.name}").alias("n_distinct"),
            F.col(f"__minn_{f.name}").alias("min_num"),
            F.col(f"__maxn_{f.name}").alias("max_num"),
            F.col(f"__mins_{f.name}").alias("min_str"),
            F.col(f"__maxs_{f.name}").alias("max_str"),
        )
        for f in fields
    ])
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
