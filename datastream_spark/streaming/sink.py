"""Exactly-once streaming ingress for manifested tables — the bridge
that closes the incremental-maintenance loop: a stream lands in a
``ManifestedTable`` as atomic per-batch commits, and every CDC
maintainer (``table_changes``, ``incremental_rollup``,
``incremental_kmv``, ``incremental_lsh_pairs``,
``incremental_ivf_assign``) consumes those commits at O(delta) from
there. Spark's built-in file sink gets exactly-once from its own sink
log, but that log is private to the sink — a manifested table needs
the idempotence marker in ITS commit protocol so CDC readers and the
streaming writer share one source of truth.

Mechanism — the canonical idempotent-``foreachBatch`` pattern from the
Structured Streaming docs, applied to our commit log: every commit the
sink makes carries ``meta = {sink_id, batch_id}``; on a replay (Spark
re-runs batch N whenever a failure lands between the sink's commit and
the checkpoint's), the sink walks the manifest log newest-first, finds
batch N already committed for this ``sink_id``, and skips — so each
micro-batch lands EXACTLY ONCE no matter how many times it is
delivered. The walk happens once per sink instance (then cached and
maintained in-memory); a restart pays one O(#versions) driver-side
JSON scan, kilobytes.

One writer per (table, sink_id) — the usual foreachBatch discipline;
distinct sinks (or batch writers, which never set the marker) may
interleave commits safely because the marker lookup matches on
``sink_id``, not on position.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ..sources.manifest import ManifestedTable

__all__ = ["manifest_append_sink"]


def manifest_append_sink(table: ManifestedTable, sink_id: str = "stream"):
    """A ``foreachBatch`` callable appending each micro-batch to
    ``table`` exactly once (replay-safe via the (sink_id, batch_id)
    commit marker). Use::

        q = (df.writeStream
               .foreachBatch(manifest_append_sink(table, "events"))
               .option("checkpointLocation", ckpt)
               .start())

    Downstream, ``table_changes(table, since=...)`` sees one insert
    batch per trigger — feed it straight to the incremental
    maintainers. Empty triggers commit nothing.
    """

    state = {"last": None}

    def _last_committed() -> int:
        for v in reversed(table._versions()):
            with open(table._manifest_path(v)) as f:
                meta = json.load(f).get("meta") or {}
            if meta.get("sink_id") == sink_id:
                return int(meta["batch_id"])
        return -1

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if state["last"] is None:
            state["last"] = _last_committed()
        if int(batch_id) <= state["last"]:
            return  # replayed batch: its rows are already committed
        if batch_df.isEmpty():
            # skip the commit but still advance the marker in memory so
            # a later replay of this empty batch stays a no-op
            state["last"] = int(batch_id)
            return
        table.append(
            batch_df, meta={"sink_id": sink_id, "batch_id": int(batch_id)}
        )
        state["last"] = int(batch_id)

    return fold
