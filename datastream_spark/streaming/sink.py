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

from pyspark.sql import DataFrame, functions as F

from ..sources.manifest import ManifestedTable

__all__ = ["manifest_append_sink", "lsh_streaming_sink"]


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


def _marker_guarded_append(
    table: ManifestedTable, sink_id: str
):
    """Internal: append-with-marker closure whose replay check reads
    the table's own commit log (the ``manifest_append_sink``
    mechanism, factored for multi-table sinks)."""
    state = {"last": None}

    def last() -> int:
        if state["last"] is None:
            found = -1
            for v in reversed(table._versions()):
                with open(table._manifest_path(v)) as f:
                    meta = json.load(f).get("meta") or {}
                if meta.get("sink_id") == sink_id:
                    found = int(meta["batch_id"])
                    break
            state["last"] = found
        return state["last"]

    def append(df: DataFrame, batch_id: int) -> bool:
        if int(batch_id) <= last():
            return False
        table.append(
            df, meta={"sink_id": sink_id, "batch_id": int(batch_id)}
        )
        state["last"] = int(batch_id)
        return True

    return append


def lsh_streaming_sink(
    band_table: ManifestedTable,
    pairs_table: ManifestedTable,
    docs_table: ManifestedTable | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    portable_hash: bool,
    sink_id: str = "lsh",
):
    """Streaming near-dup detection: a ``foreachBatch`` callable that,
    per micro-batch of documents, (1) bands ONLY the batch's docs,
    (2) emits the batch's NEW candidate pairs — batch x stored bands
    plus batch x batch — into ``pairs_table``, (3) folds the batch's
    band rows into ``band_table``, and (4) optionally lands the raw
    docs in ``docs_table``. The union of ``pairs_table`` over all
    triggers equals a from-scratch ``minhash_candidate_pairs`` over
    everything streamed (the delta-banding theorem, pinned by test),
    so "which existing documents does this new arrival collide with?"
    is answered continuously at O(batch) signature cost.

    Exactly-once across crashes WITHOUT cross-table transactions: each
    table carries its own (sink_id, batch_id) marker, the work is
    ordered pairs -> bands -> docs, and pairs are always computed
    against the band table BEFORE this batch's bands land — so a crash
    between any two commits replays only the missing suffix, and a
    replayed pair computation can never see (and double-join) its own
    batch's bands. Band geometry/hash-family metadata rides on the
    band rows exactly as in ``incremental_lsh_pairs``; the hot path
    shares its join core (``pairs_from_bands``). One writer per
    (tables, sink_id).
    """
    from ..operators.dedup import band_key_frame, minhash_signature_arrays
    from ..sources.cdc import pairs_from_bands

    meta = {
        "_num_hashes": int(num_hashes),
        "_rows_per_band": int(rows_per_band),
        "_shingle_k": int(shingle_k),
        "_portable": bool(portable_hash),
    }
    put_pairs = _marker_guarded_append(pairs_table, sink_id)
    put_bands = _marker_guarded_append(band_table, sink_id)
    put_docs = (
        _marker_guarded_append(docs_table, sink_id) if docs_table else None
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        arrays = minhash_signature_arrays(
            batch_df,
            id_col,
            text_col,
            num_hashes=num_hashes,
            shingle_k=shingle_k,
            portable_hash=portable_hash,
        )
        # one computation of the batch's bands feeds the pair join AND
        # the band-table commit (the incremental_lsh_pairs barrier
        # doctrine, here via non-eager checkpoint)
        delta_bands = (
            band_key_frame(arrays, id_col, rows_per_band)
            .select(
                id_col,
                "band",
                "band_hash",
                *[F.lit(v).alias(k) for k, v in meta.items()],
            )
            .localCheckpoint(eager=False)
        )
        old = band_table.read()
        pairs = pairs_from_bands(delta_bands, old, id_col)
        put_pairs(pairs, batch_id)
        put_bands(delta_bands, batch_id)
        if put_docs is not None:
            put_docs(batch_df, batch_id)

    return fold
