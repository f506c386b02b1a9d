"""SparkSession factory with the engine's required/recommended config.

Scale doctrine (SURVEY.md §7): UTC session clock, AQE on (runtime join
re-planning + skew splitting + partition coalescing), Arrow for any
pandas exchange, shuffle partitions sized by env for the test box.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datastream-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce to the advisory partition size instead of maximizing
        # task count: tiny post-shuffle datasets become a handful of
        # tasks rather than 32 near-empty ones (halves small-query wall
        # time locally). The advisory size is deliberately small for a
        # single-node test box — heavy mid-size stages (LSH expansions)
        # still need ~2 tasks per core; on a real cluster raise it to
        # the usual 64-256MB, where the same setting is the one Spark's
        # tuning guide recommends for production.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_ADVISORY_PARTITION_SIZE", "4MB"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Testdata parquet stores timestamps with isAdjustedToUTC=false;
        # Spark 4 would surface those as TIMESTAMP_NTZ, which half the
        # time-arithmetic builtins (unix_micros, window, to_utc_timestamp)
        # reject. With the session clock pinned to UTC, reading them as
        # plain TIMESTAMP is value-identical (same wall clock == same
        # instant) and keeps every operator on the fully-supported type.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Long multi-query sessions: ContextCleaner only reclaims shuffle
        # files / broadcasts when the driver GCs, which a large heap may
        # never do on its own — later queries then run against an
        # accumulated pile of dead state (observed 4x slowdown on the
        # bench suite's tail queries). Force a periodic driver GC.
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    # Optional JVM flags for the embedded local-mode JVM (e.g. JIT
    # tiering experiments on the bench suite); no-op when unset or when
    # a JVM already exists (getOrCreate reuses it).
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    # Caller-specific additions (e.g. bench.py's event-log counters);
    # applied last so a caller can also override a default knowingly.
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_probe_conf(spark: SparkSession) -> SparkSession:
    """Make a caller-provided session safe for the oracle probes:
    UTC clock (timestamp bucketing must not depend on ambient TZ) and
    ns-timestamp parquet readable (Spark lacks a TIMESTAMP(NANOS) type;
    read as long and convert — see ``datastream_spark.sources``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # See get_spark: read naive parquet timestamps as TIMESTAMP, not
    # TIMESTAMP_NTZ (value-identical under the UTC session clock above).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark


def _strip_ntz(dt):
    """Rewrite TIMESTAMP_NTZ to TIMESTAMP anywhere in a (possibly
    nested) DataType; returns None when nothing needs rewriting so the
    caller can skip the cast entirely."""
    from pyspark.sql import types as T

    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampType()
    if isinstance(dt, T.ArrayType):
        inner = _strip_ntz(dt.elementType)
        return None if inner is None else T.ArrayType(inner, dt.containsNull)
    if isinstance(dt, T.MapType):
        k, v = _strip_ntz(dt.keyType), _strip_ntz(dt.valueType)
        if k is None and v is None:
            return None
        return T.MapType(
            k or dt.keyType, v or dt.valueType, dt.valueContainsNull
        )
    if isinstance(dt, T.StructType):
        fields, changed = [], False
        for f in dt.fields:
            inner = _strip_ntz(f.dataType)
            if inner is not None:
                changed = True
            fields.append(
                T.StructField(f.name, inner or f.dataType, f.nullable, f.metadata)
            )
        return T.StructType(fields) if changed else None
    return None


def normalize_ntz(df):
    """Cast any TIMESTAMP_NTZ column — top-level or nested inside
    struct/array/map — to TIMESTAMP.

    Defense-in-depth for sessions where ``inferTimestampNTZ`` was not
    disabled before the scan was planned (cached relations): under a UTC
    session clock the cast preserves the epoch value exactly — which is
    why a non-UTC session clock is rejected here rather than silently
    shifting every epoch. Nested rewrites are a single type-level cast
    (Spark casts struct/array/map recursively by field position)."""
    targets = {f.name: _strip_ntz(f.dataType) for f in df.schema.fields}
    targets = {k: v for k, v in targets.items() if v is not None}
    if not targets:
        return df
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"normalize_ntz requires a UTC session clock (got {tz!r}); "
            "call ensure_probe_conf(spark) first"
        )
    for name, dtype in targets.items():
        # df[name], not F.col(name): immune to dots/backticks in
        # column names being parsed as nested-field paths.
        df = df.withColumn(name, df[name].cast(dtype))
    return df
