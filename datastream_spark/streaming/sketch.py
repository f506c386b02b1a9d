"""Streaming sketches: the continuous-ingest counterparts of the
mergeable approximate aggregates (operators/cms.py, the HLL ladder).

The count-min build is a pure groupBy aggregation whose state is
bounded at depth*width cells BY CONSTRUCTION — not by a watermark.
That makes it the rare aggregation where COMPLETE output mode is the
right doctrine: the state store holds ≤ depth*width rows no matter how
many events stream through, and every trigger can re-emit the whole
current sketch for pennies. (Contrast the rollup streams, where state
is O(open buckets) and the finalized-bucket/APPEND discipline exists
to bound it — a sketch needs no such discipline.)

Batch and streaming share one cell-projection + aggregation definition
(``operators.cms.cms_sketch`` runs unchanged on a streaming frame);
the wrapper here exists to carry the output-mode doctrine and keep the
streaming surface discoverable in one package. Parity (streamed sketch
== batch sketch of the same rows, cell-exact) is pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cms import cms_sketch


def streaming_cms_sketch(
    stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    portable: bool = False,
) -> DataFrame:
    """Running count-min sketch over a stream: (d, w, cnt) rows that
    always reflect every event seen so far. Write with
    ``outputMode("complete")`` — the result is ≤ depth*width rows, so
    complete mode costs a constant re-emit per trigger and downstream
    consumers (``cms_estimate``, ``cms_merge`` against other shards)
    read the sink as a plain bounded table. No watermark is needed:
    late events are simply counted when they arrive, exactly as the
    batch build would count them."""
    return cms_sketch(stream, key_col, depth=depth, width=width, portable=portable)


def streaming_value_histogram(
    stream: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Running fixed-width histogram over a stream — the continuous
    side of drift monitoring (operators/drift.py): state is bounded at
    ``n_bins`` rows BY CONSTRUCTION, so like the count-min sketch this
    is a COMPLETE-mode aggregation with constant re-emit cost and no
    watermark doctrine (late values land in their bin whenever they
    arrive, exactly as the batch build counts them). Feed each emitted
    snapshot to ``psi_drift`` against a pinned reference histogram for
    a live drift score over the whole stream history; for windowed
    drift, bucket upstream and group on (window, bin) instead."""
    from ..operators.drift import value_histogram

    return value_histogram(stream, value_col, lo, hi, n_bins)
