"""Physical table layout: the Spark-native replacement for the
reference's MongoDB collections (SURVEY.md §2.1 S7, §1.2).

Layout under a store root:

- ``datapoints/``          raw appends, parquet partitioned by ``p_date``
                           (the reference's timestamp-in-ObjectId range
                           trick re-expressed as partition pruning +
                           parquet min/max skipping, mongodb.py:~550)
- ``datapoints_derived/``  computed streams, partitioned by ``stream_id``
                           (dynamic partition overwrite = idempotent
                           recompute of one derived stream)
- ``rollup_<granularity>/`` the materialized ladder, partitioned by
                           ``p_date`` of the bucket

At 100 TB: date partitions bound every incremental job's input; the
optional ``stream_bucket`` column (hash(stream_id) % N) is the hook for
bucketing/co-location so per-stream windows avoid a full shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("value_dec", T.DecimalType(38, 9), True),
        T.StructField("value_json", T.StringType(), True),
    ]
)


class TableStore:
    def __init__(self, spark: SparkSession, root: str, n_stream_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.n_stream_buckets = n_stream_buckets
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and any(
            f.endswith(".parquet") or f.startswith(("p_date=", "stream_id="))
            for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame | None:
        if not self.exists(table):
            return None
        return self.spark.read.parquet(self.path(table))

    def append_raw(self, df: DataFrame) -> None:
        """Append datapoints, adding the date partition and bucket cols."""
        out = (
            df.withColumn("p_date", F.to_date("ts").cast("string"))
            .withColumn(
                "stream_bucket",
                F.pmod(F.xxhash64("stream_id"), F.lit(self.n_stream_buckets)).cast(
                    "int"
                ),
            )
        )
        out.write.mode("append").partitionBy("p_date").parquet(self.path("datapoints"))

    def overwrite_derived(self, df: DataFrame, stream_ids: list[str]) -> None:
        """Idempotent recompute: dynamic partition overwrite replaces
        exactly the (stream, date) partitions present in ``df``.

        Partitioned by ``(stream_id, p_date)`` so a tail recompute
        rewrites only the affected dates of the affected stream — the
        write-side half of W5 incremental propagation. A full recompute
        emits every date and therefore replaces them all."""
        (
            df.withColumn("p_date", F.to_date("ts").cast("string"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("stream_id", "p_date")
            .parquet(self.path("datapoints_derived"))
        )

    def _rollup_partitioned(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "p_date",
            F.to_date(F.timestamp_seconds(F.col("bucket_epoch"))).cast("string"),
        )

    def append_rollup(self, df: DataFrame, granularity_name: str) -> None:
        """Append-mode rollup write — the pre-aggregated ingest path
        (user-supplied bucket rows at the stream's own highest level).
        Same (p_date, stream_id) layout as ``overwrite_rollup`` so both
        writers share one partition scheme per table."""
        self._rollup_partitioned(df).write.mode("append").partitionBy(
            "p_date", "stream_id"
        ).parquet(self.path(f"rollup_{granularity_name}"))

    def write_bucketed(
        self,
        df: DataFrame,
        table_name: str,
        bucket_col: str = "stream_id",
        n_buckets: int | None = None,
        sort_col: str | None = "ts",
    ) -> None:
        """Materialize a frame as a BUCKETED managed table — the
        co-location swap-in for per-stream joins and windows at scale.

        Two tables bucketed on the same column with the same bucket
        count join WITHOUT a shuffle exchange: each bucket file pair is
        joined locally (plan-asserted in test_bucketed_join_is_
        shuffle_free). At 100 TB that removes the dominant network cost
        of stream-aligned joins (W1 sum-of-streams, as-of lookups) and
        of repeated per-stream windowing — the sort order persisted by
        ``sort_col`` serves the window's ORDER BY from disk.

        Bucket count should track the executor fleet (more buckets =
        finer parallelism, smaller files); defaults to the store's
        ``n_stream_buckets``.
        """
        n = n_buckets or self.n_stream_buckets
        writer = df.write.mode("overwrite").format("parquet").bucketBy(
            n, bucket_col
        )
        if sort_col is not None and sort_col in df.columns:
            writer = writer.sortBy(sort_col)
        writer.saveAsTable(table_name)

    def overwrite_rollup(self, df: DataFrame, granularity_name: str) -> None:
        """Idempotent downsample write: dynamic partition overwrite of
        exactly the (date, stream) partitions present in ``df``.

        This is the crash-consistency half of the ladder: the cascade
        recomputes each stream from the UTC day containing its
        watermark and REPLACES those partitions, so the write is a
        fixed point — a crash between the data write and the registry
        watermark advance re-runs the same slice on the next cascade
        and rewrites identical partitions instead of appending
        duplicate buckets. Write ordering is always data first, then
        registry watermark (never the reverse: a watermark pointing
        past missing data would silently skip buckets forever, while a
        stale watermark merely repeats idempotent work).

        Per-(stream, level) there is a single writer kind: streams
        receive either pre-aggregated appends at their own highest
        level or cascade overwrites at coarser levels, never both.
        At very large stream counts, swap stream_id for a hash bucket
        (coarser overwrite unit) and run level-complete cascades.

        The pre-write repartition on the partition keys is the
        small-file guard: without it every shuffle task writes its own
        fragment into every (date, stream) dir it touches — measured
        ~32 files per dir and a 6x slower full-ladder downsample at 1M
        datapoints / 50 streams (SCALE.md §8). One shuffle buys one
        file per partition dir, which is also what keeps the
        downstream ladder scans from dying of file-listing overhead at
        scale."""
        (
            self._rollup_partitioned(df)
            .repartition("p_date", "stream_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("p_date", "stream_id")
            .parquet(self.path(f"rollup_{granularity_name}"))
        )
