"""Streaming deduplication: the streaming counterpart of the X1 exact
dedup operator (SURVEY.md §2.10) for continuous corpus ingest.

Batch dedup groups the whole corpus; a stream cannot. Structured
Streaming's native answer is state-store-backed duplicate dropping:

- ``streaming_dedup_exact``: drop rows whose key was already seen,
  with the state bounded by a watermark — the standard
  ``withWatermark + dropDuplicatesWithinWatermark`` pattern (keys
  older than the watermark are evicted from the state store, so state
  is O(events per watermark window), not O(corpus)).
- ``fingerprint_key``: content-stable key for text payloads (md5 of
  normalized text) so near-identical whitespace variants dedup
  together, matching the batch normalizer.

At 100 TB the state store shards by key hash across executors
(HDFS/RocksDB-backed), and the watermark bound is what keeps it from
growing without limit — the same finalized-bucket discipline the rollup
streams use (§2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import norm_text


def fingerprint_key(text_col: Column) -> Column:
    """Content-stable dedup key: md5 of the batch normalizer's output
    (same normalization as operators.dedup.exact — lower/trim/collapse
    whitespace), so streaming and batch agree on what "identical"
    means."""
    return F.md5(norm_text(text_col))


def streaming_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows by key within the watermark horizon.

    Exactly-once-per-key within the horizon; a duplicate arriving after
    its original has aged past the watermark is admitted again (the
    unavoidable streaming relaxation — unbounded-state dedup would need
    the whole corpus in the state store)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
