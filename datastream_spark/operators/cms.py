"""Count-min sketch: a mergeable frequency sketch + heavy hitters.

Extends the approx-aggregate ladder the same way the HLL downsampler
does (SURVEY §2 A+ family; the reference's downsamplers are exact —
this is the public count-min construction of Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 55(1), 2005).

Representation: LONG FORM — one row per non-empty (depth, bucket)
cell. On Spark this beats an opaque binary blob because:

- building the sketch is one groupBy with MAP-SIDE partial
  aggregation: the shuffle carries at most ``depth * width`` rows per
  map partition regardless of input size N;
- merging sketches (cross-partition, cross-day, cross-source) is a
  plain ``groupBy(d, w).sum(cnt)`` — associative, commutative, no
  driver involvement, no UDF;
- point estimation is a BROADCAST join of the candidate keys against
  the ≤ depth*width-row sketch, entirely inside whole-stage codegen.

Hash family doctrine matches dedup.py: ``portable=True`` uses the
md5-hex→bigint chain replayable in DuckDB oracle SQL; production
(``portable=False``) uses xxhash64 seeded by the depth index — one
JVM intrinsic per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_bucket",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "cms_heavy_hitters",
]


#: portable family: one 60-bit md5 per key, sliced into disjoint
#: 15-bit fields per depth — so at most 4 depths.
_PORTABLE_MAX_DEPTH = 4


def cms_bucket(key: Column, d: int, width: int, portable: bool) -> Column:
    """Bucket index for string key `key` at depth ``d`` (python int).

    portable: ONE md5 per key -> 60-bit bigint -> depth d reads the
    d-th disjoint 15-bit slice (shift then MASK — without the mask,
    `% width` for a non-power-of-2 width would read bits above the
    slice and correlate the depth rows) -> % width. Disjoint masked
    slices of a uniform hash are independent uniform values, so this
    is the standard independent family at a quarter of the
    per-depth-md5 hash cost (exactly uniform for power-of-2 widths,
    negligible modulo bias otherwise); codegen subexpression
    elimination computes the md5 once per row across all depths.
    DuckDB replays it verbatim. Depth is capped at 4 (60/15 bits) —
    `cms_sketch` validates.
    production: xxhash64(key, d) -> pmod width, one JVM intrinsic per
    (row, depth), no depth cap.
    """
    if portable:
        if width > (1 << 15):
            raise ValueError("portable cms: width must be <= 32768 (15-bit slices)")
        h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
        slice_d = F.shiftrightunsigned(h, d * 15).bitwiseAND(F.lit(0x7FFF))
        return (slice_d % F.lit(width)).alias("w")
    return F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width)).alias("w")


def _cells(key: Column, depth: int, width: int, portable: bool) -> list[Column]:
    if portable and depth > _PORTABLE_MAX_DEPTH:
        raise ValueError(
            f"portable cms: depth must be <= {_PORTABLE_MAX_DEPTH} "
            "(one 60-bit md5 sliced 15 bits per depth)"
        )
    return [
        F.posexplode(
            F.array(*[cms_bucket(key, d, width, portable) for d in range(depth)])
        ).alias("d", "w")
    ]


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    portable: bool = False,
) -> DataFrame:
    """Build a long-form count-min sketch: DataFrame (d int, w int, cnt long).

    One posexplode (xN rows per depth) then a map-side-combined
    groupBy — the shuffle is bounded by depth*width cells per map
    partition, so sketching 100 TB costs one scan plus a
    constant-size exchange.
    """
    k = F.col(key_col).cast("string")
    return (
        df.select(k.alias("_k"))
        .select(*_cells(F.col("_k"), depth, width, portable))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge long-form sketches built with identical (depth, width,
    hash family): union + re-sum. Exact — counts are additive."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    portable: bool = False,
) -> DataFrame:
    """Point-estimate each key in `keys[key_col]`: min over depths of
    the matching cell (absent cell = 0). Returns keys + ``est`` long.

    The sketch side is ≤ depth*width rows — broadcast it; the probe
    plan audit asserts no shuffle lands on the candidate side beyond
    the final min-groupBy.
    """
    cand = keys.select(F.col(key_col)).distinct()
    probed = cand.select(
        key_col,
        *_cells(F.col(key_col).cast("string"), depth, width, portable),
    )
    joined = probed.join(F.broadcast(sketch), ["d", "w"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_frac: float,
    depth: int = 4,
    width: int = 512,
    portable: bool = False,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Keys whose count-min estimate is >= min_frac * N.

    Count-min never under-estimates, so the result is a SUPERSET of
    the true heavy hitters (classic CMS guarantee); over-estimates are
    bounded by e/width * N per depth row w.h.p. `candidates` defaults
    to the distinct keys of `df` — at 100 TB pass an explicit bounded
    candidate set (e.g. keys surviving a per-partition local top-k)
    instead of shuffling the full key domain.
    """
    sketch = cms_sketch(df, key_col, depth, width, portable)
    cand = candidates if candidates is not None else df.select(key_col)
    est = cms_estimate(sketch, cand, key_col, depth, width, portable)
    total = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est") >= F.col("_n") * F.lit(min_frac))
        .select(key_col, "est")
    )
