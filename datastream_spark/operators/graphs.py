"""Graph value-type read surface (SURVEY.md §1.1 value types).

The reference stores graph snapshots as ``{'v': [{'i': id, ...}],
'e': [{'f': from, 't': to, ...}]}`` per datapoint (api.py:~280 value
type registry [HIGH]; graph storage mongodb.py:~900 [MED]) but exposes
them only as opaque dicts. Here the snapshots become first-class
relational data: typed vertex / edge DataFrames and per-snapshot
topology stats, all set-oriented (``from_json`` + ``explode`` — one
plan for any number of snapshots, no driver-side JSON parsing).

Contract fields (``i`` / ``f`` / ``t``) are surfaced as typed columns;
remaining attributes ride along as a MAP<STRING,STRING> (scalar JSON
values are coerced to strings by ``from_json``), so schema evolution
in attrs never breaks the scan.

Scale: narrow transforms over the date-partitioned datapoints table —
pruning and pushdown behave exactly like any other raw read; explode
fan-out is bounded by snapshot size, and per-snapshot aggregates
reduce map-side before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: JSON schema of one stored snapshot (canonical JSON from ingest)
GRAPH_JSON_SCHEMA = "v array<map<string,string>>, e array<map<string,string>>"


def parse_snapshots(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """(stream_id, ts, vertices, edges) — one row per snapshot."""
    g = F.from_json(F.col(json_col), GRAPH_JSON_SCHEMA)
    return df.select(
        "stream_id",
        "ts",
        F.coalesce(g["v"], F.array()).alias("vertices"),
        F.coalesce(g["e"], F.array()).alias("edges"),
    )


def graph_vertices(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """One row per vertex per snapshot: (stream_id, ts, vertex_id,
    attrs) with the contract key ``i`` lifted out of the attr map."""
    snaps = parse_snapshots(df, json_col)
    v = snaps.select(
        "stream_id", "ts", F.explode("vertices").alias("_v")
    )
    return v.select(
        "stream_id",
        "ts",
        F.col("_v")["i"].alias("vertex_id"),
        F.map_filter(F.col("_v"), lambda k, _: k != "i").alias("attrs"),
    )


def graph_edges(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """One row per edge per snapshot: (stream_id, ts, src, dst, attrs)
    with the contract keys ``f``/``t`` lifted out of the attr map."""
    snaps = parse_snapshots(df, json_col)
    e = snaps.select("stream_id", "ts", F.explode("edges").alias("_e"))
    return e.select(
        "stream_id",
        "ts",
        F.col("_e")["f"].alias("src"),
        F.col("_e")["t"].alias("dst"),
        F.map_filter(
            F.col("_e"), lambda k, _: (k != "f") & (k != "t")
        ).alias("attrs"),
    )


def graph_stats(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """Per-snapshot topology stats, one aggregation-free pass:
    (stream_id, ts, n_vertices, n_edges, max_out_degree,
    n_self_loops). Degree is computed inside the arrays (higher-order
    functions), so snapshots never shuffle — the row count equals the
    snapshot count going in and out."""
    snaps = parse_snapshots(df, json_col)
    edges = F.col("edges")
    srcs = F.transform(edges, lambda e: e["f"])
    max_out = F.array_max(
        F.transform(
            F.array_distinct(srcs),
            lambda s: F.size(F.filter(srcs, lambda x: x == s)),
        )
    )
    return snaps.select(
        "stream_id",
        "ts",
        F.size("vertices").cast("long").alias("n_vertices"),
        F.size(edges).cast("long").alias("n_edges"),
        F.coalesce(max_out, F.lit(0)).cast("long").alias("max_out_degree"),
        F.size(F.filter(edges, lambda e: e["f"] == e["t"]))
        .cast("long")
        .alias("n_self_loops"),
    )
