"""Ingest-edge readers: CSV / JSON / parquet -> the datapoint wire
schema (SURVEY.md §2.1 S7).

The reference's "connectors" are database backends (MongoDB, InfluxDB
— datastream/backends/*.py); in a Spark-first engine the ingest edge
is files on object storage, so connector breadth = file-format breadth
over ONE declared wire schema. Schemas are always declared, never
inferred: inference is a full extra pass over the data at 100 TB and
makes the pipeline's types depend on the sample it saw.

All readers return (stream_id STRING, ts TIMESTAMP, value DOUBLE)
frames ready for ``Datastream.append_dataframe`` or the streaming
ingest path (streaming/ingest.py shares the same schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ingest import DATAPOINT_SCHEMA


def read_datapoints_parquet(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return _conform(df)


def read_datapoints_csv(
    spark: SparkSession, path: str, header: bool = True, ts_format: str | None = None
) -> DataFrame:
    """CSV with columns stream_id,ts,value. ``ts_format`` overrides the
    default ISO-8601 parse; malformed rows land in the PERMISSIVE-mode
    null bucket and are dropped by the validation filter downstream."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if ts_format:
        reader = reader.option("timestampFormat", ts_format)
    df = reader.schema(DATAPOINT_SCHEMA).csv(path)
    return _conform(df)


def read_datapoints_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines with fields stream_id/ts/value (ts ISO-8601 or epoch
    seconds as number — both normalized)."""
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .schema("stream_id STRING, ts STRING, value DOUBLE")
        .json(path)
    )
    # try_* variants: ANSI mode (Spark 4 default) makes the plain casts
    # THROW on the other representation instead of yielding null
    ts = F.coalesce(
        F.try_to_timestamp(F.col("ts")),
        F.timestamp_seconds(F.expr("try_cast(ts AS DOUBLE)")),
    )
    return _conform(df.withColumn("ts", ts))


def _conform(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("stream_id").cast("string").alias("stream_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )


def read_datapoints_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC with columns stream_id/ts/value (Spark-native source — the
    other columnar format warehouses hand us at the ingest edge)."""
    return _conform(spark.read.orc(path))


def read_datapoints_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro with fields stream_id/ts/value. Spark's Avro source is an
    external module (``spark-avro``); environments without it get a
    loud, actionable error instead of a ClassNotFound stack."""
    try:
        df = spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - env-dependent
        if "avro" in str(exc).lower() or "Failed to find" in str(exc):
            raise NotImplementedError(
                "Avro source requires the spark-avro package "
                "(--packages org.apache.spark:spark-avro_2.13:<version>); "
                "it is not bundled in this environment"
            ) from exc
        raise
    return _conform(df)
