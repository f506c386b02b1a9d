"""Structured Streaming path (SURVEY.md §2.9 / §7 M7).

Maps the reference's ingest-side streaming semantics (append-only
series, incremental rollups, finalized-buckets-only visibility,
resumable watermarks — datastream/backends/mongodb.py:~1200-1400 [MED])
onto Spark Structured Streaming:

- monotonic-append discipline        -> ``withWatermark`` late-drop
- "no partial buckets ever visible"  -> tumbling window, APPEND mode
- per-stream ``downsampled_until``   -> checkpointed state
- cron `downsample_streams` worker   -> continuous streaming query

The aggregation expressions are shared with the batch path
(``operators.rollup``) — one definition, two runtimes.
"""

from .rollup import (
    materialize_rollup_stream,
    session_rollup_stream,
    sliding_rollup_stream,
    streaming_rollup,
)
from .curation import streaming_decontaminate
from .dedup import fingerprint_key, streaming_dedup_exact
from .derive import (
    streaming_counter_derivative,
    streaming_counter_reset,
    streaming_derivative,
)
from .ingest import read_datapoint_stream, validated_stream
from .funnel import (
    streaming_funnel,
    streaming_retention_enrich,
    streaming_top_paths,
)
from .joins import streaming_interval_join
from .quality import streaming_check_counters
from .sink import (
    lsh_streaming_sink,
    manifest_append_sink,
    simhash_streaming_sink,
)
from .sketch import (
    kmv_foreach_batch_sink,
    streaming_cms_sketch,
    streaming_kmv_sketch,
    streaming_psi_drift,
    streaming_value_histogram,
)

__all__ = [
    "fingerprint_key",
    "kmv_foreach_batch_sink",
    "lsh_streaming_sink",
    "simhash_streaming_sink",
    "manifest_append_sink",
    "streaming_check_counters",
    "streaming_cms_sketch",
    "streaming_interval_join",
    "streaming_kmv_sketch",
    "streaming_psi_drift",
    "streaming_value_histogram",
    "streaming_funnel",
    "streaming_retention_enrich",
    "streaming_top_paths",
    "materialize_rollup_stream",
    "read_datapoint_stream",
    "session_rollup_stream",
    "sliding_rollup_stream",
    "streaming_counter_derivative",
    "streaming_counter_reset",
    "streaming_decontaminate",
    "streaming_dedup_exact",
    "streaming_derivative",
    "streaming_rollup",
    "validated_stream",
]
