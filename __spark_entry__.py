"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The probe suite itself lives in ``datastream_spark.probes`` (each
probe implemented Spark-first with a DuckDB oracle twin); this module
is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datastream_spark import probes  # noqa: E402
from datastream_spark import probes_llm  # noqa: E402,F401  (registers X probes)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full downsampler ladder level (A1-A7, one
    hash-agg pass) over sf0.001 events."""
    return probes.QUERIES["q_a1_rollup_10s"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(probes.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(probes.ORACLES)
