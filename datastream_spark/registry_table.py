"""DataFrame-backed stream registry: the millions-of-streams scale path.

Parity/scale target: the reference keeps one metadata document per
stream and its deployments run with millions of streams (SURVEY.md
§1.1 — "streams are data, not schema"). The JSON-lines
``StreamRegistry`` (registry.py) is the right altitude for the
reference-parity API at thousands of streams — a driver dict — but it
rewrites the whole file per save and scans every descriptor per find.
This module is the swap-in for the two operations that actually meet
the data path at scale:

- **bulk find-or-create** (``ensure_bulk``): one set-oriented
  anti-join + append commit per batch of stream specs, instead of one
  driver dict probe + full-file rewrite per stream;
- **registry frame for data-path joins** (``frame``): the registry IS
  a Spark DataFrame (snapshot-isolated parquet via ``ManifestedTable``),
  so ``append_dataframe`` validation broadcasts a real table instead
  of driver-serializing ``registry.all()`` into ``createDataFrame``
  per batch.

Tags are stored flattened (dotted paths) as ``map<string,string>``
with JSON-encoded values, so subset queries compile to
``tags['k'] = 'v'`` conjunctions — plain Catalyst filters over a
broadcast-sized dimension table. Commits ride the manifest log's
optimistic concurrency: a racing writer surfaces as
``CommitConflict`` and the bulk operation retries against the new
snapshot (re-running its anti-join, so same-spec races converge to
one stream, not duplicates).

Measured at 1M streams on local[32] (tools/registry_bench.py writes
the numbers into SCALE.md §1): ensure_bulk of 1M specs in one commit,
find-by-tag, and a 10M-row append validation join against the 1M-row
registry frame are all single-digit seconds; the JSON registry's
full-file rewrite alone is ~10x the ensure cost at that cardinality.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import _flatten
from .sources.manifest import CommitConflict, ManifestedTable

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("tag_sig", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("value_downsamplers", T.ArrayType(T.StringType()), False),
        T.StructField("highest_granularity", T.StringType(), False),
        T.StructField("value_type", T.StringType(), False),
        T.StructField("derive_op", T.StringType(), True),
        T.StructField("derived_from", T.ArrayType(T.StringType()), True),
        T.StructField("earliest_us", T.LongType(), True),
        T.StructField("latest_us", T.LongType(), True),
    ]
)


def flatten_tags(tags: dict) -> dict[str, str]:
    """Dotted-path flattening with JSON-encoded values (type-faithful
    round trip; the map column stays string-typed for pushdown)."""
    return {k: json.dumps(v, sort_keys=True) for k, v in _flatten(tags).items()}


def tag_signature(query_tags: dict) -> str:
    """Canonical identity of a stream's query tags — the find-or-create
    key (sorted flattened pairs, JSON-encoded)."""
    return json.dumps(flatten_tags(query_tags), sort_keys=True)


class ScalableStreamRegistry:
    """Snapshot-isolated, set-oriented stream registry.

    All operations are whole-batch: callers hand in a DataFrame (or
    list) of specs/updates and get one commit, not N. Reads are
    against the latest manifest snapshot and therefore stable under
    concurrent commits.
    """

    MAX_RETRIES = 8

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.table = ManifestedTable(spark, root)

    # -- reads --------------------------------------------------------

    def frame(self) -> DataFrame:
        """The registry as a DataFrame (empty frame before first
        commit). Dimension-table sized: broadcast it into data-path
        joins."""
        df = self.table.read()
        if df is None:
            return self.spark.createDataFrame([], REGISTRY_SCHEMA)
        return df

    def count(self) -> int:
        return self.frame().count()

    def find(self, query_tags: dict | None = None) -> DataFrame:
        """Subset tag match as Catalyst filters:
        ``tags['k'] = '<json v>'`` conjunction over the flattened
        query. Returns matching registry rows."""
        df = self.frame()
        for k, v in flatten_tags(query_tags or {}).items():
            df = df.where(F.col("tags")[k] == v)
        return df

    def append_validation_frame(self) -> DataFrame:
        """The three columns the bulk-append path joins against."""
        return self.frame().select(
            "stream_id",
            "latest_us",
            F.col("derive_op").isNotNull().alias("is_derived"),
        )

    # -- writes -------------------------------------------------------

    def ensure_bulk(self, specs: DataFrame) -> int:
        """Set-oriented find-or-create: one commit for a whole batch of
        stream specs.

        ``specs`` must carry REGISTRY_SCHEMA minus ``stream_id`` (a
        ``tag_sig`` column plus config); rows whose ``tag_sig`` already
        exists are no-ops, the rest are created with fresh UUIDs in ONE
        append commit. Returns the number of streams created. Retries
        on ``CommitConflict`` against the new snapshot — the re-run
        anti-join absorbs specs a racing writer created first."""
        for _ in range(self.MAX_RETRIES):
            existing = self.frame().select("tag_sig")
            fresh = (
                specs.dropDuplicates(["tag_sig"])
                .join(existing, "tag_sig", "left_anti")
                .withColumn("stream_id", F.expr("uuid()"))
                .select([f.name for f in REGISTRY_SCHEMA.fields])
            )
            # Materialize ONCE before committing: uuid() is
            # nondeterministic, and the commit must publish exactly the
            # files written — ManifestedTable.append already writes
            # before linking, so the write is the materialization.
            n = fresh.count()
            if n == 0:
                return 0
            try:
                self.table.append(fresh)
                return n
            except CommitConflict:
                continue  # racer landed; re-anti-join on new snapshot
        raise CommitConflict("ensure_bulk: retries exhausted")

    def touch_latest(self, updates: DataFrame) -> None:
        """Merge per-stream watermark advances: ``updates`` is
        (stream_id, latest_us, earliest_us). One read-modify-overwrite
        commit with monotonic ``greatest``/``least`` merges; retried on
        conflict."""
        up = updates.select(
            "stream_id",
            F.col("latest_us").alias("_new_latest"),
            F.col("earliest_us").alias("_new_earliest"),
        )
        for _ in range(self.MAX_RETRIES):
            cur = self.frame()
            merged = (
                cur.join(F.broadcast(up), "stream_id", "left")
                .withColumn(
                    "latest_us",
                    F.greatest(
                        F.col("latest_us"), F.col("_new_latest")
                    ),
                )
                .withColumn(
                    "earliest_us",
                    F.least(
                        F.col("earliest_us"), F.col("_new_earliest")
                    ),
                )
                .drop("_new_latest", "_new_earliest")
            )
            try:
                self.table.overwrite(merged)
                return
            except CommitConflict:
                continue
        raise CommitConflict("touch_latest: retries exhausted")


def specs_frame(spark: SparkSession, specs: list[dict[str, Any]]) -> DataFrame:
    """Helper: build an ``ensure_bulk`` input frame from plain dicts
    (each with ``tags`` plus optional config keys)."""
    rows = []
    for s in specs:
        tags = s["tags"]
        rows.append(
            (
                tag_signature(tags),
                flatten_tags(tags),
                s.get("value_downsamplers", ["count", "sum", "min", "max"]),
                s.get("highest_granularity", "seconds"),
                s.get("value_type", "numeric"),
                s.get("derive_op"),
                s.get("derived_from"),
                s.get("earliest_us"),
                s.get("latest_us"),
            )
        )
    schema = T.StructType([f for f in REGISTRY_SCHEMA.fields if f.name != "stream_id"])
    return spark.createDataFrame(rows, schema)


class TableStreamRegistry:
    """``StreamRegistry``-compatible backend on the manifest table —
    the registry the ``Datastream`` API drives at millions of streams
    (``Datastream(spark, root, registry_backend="table")``).

    Persistence is an LSM-style delta log: ``save()`` appends ONLY the
    descriptors that changed since the last load/save (plus tombstones
    for deletions) as one OCC commit — O(dirty), not O(streams) —
    where the JSON-lines registry rewrites its whole file per save
    (measured 9.2 s per mutation at 1M streams, SCALE.md §1). Reads
    resolve last-writer-wins per stream via a window over the commit
    version; ``compact()`` folds the log back to one snapshot.

    Concurrency matches the JSON path's contract: ``save(
    expect_unchanged=True)`` raises ``StreamAppendContended`` when
    another writer committed since our snapshot (manifest version is
    the signature); metadata-only writers keep last-writer-wins at
    the descriptor level.
    """

    def __init__(self, spark: SparkSession, root: str):
        import os

        self.spark = spark
        self.root = root
        self.table = ManifestedTable(spark, os.path.join(root, "_streams_log"))
        self._streams: dict = {}
        #: last-saved state per stream as an INDEPENDENT parsed dict
        #: (json.loads gives fresh objects, so in-place mutations of a
        #: descriptor's lists/dicts can't alias the snapshot) — dict
        #: equality is ~20x cheaper than re-serializing to JSON, which
        #: keeps the save()-time dirty scan cheap at millions of
        #: streams (measured: 8.3 s -> sub-second for a 10-dirty save
        #: over 1M descriptors)
        self._snapshot: dict[str, dict] = {}
        self.load()

    # -- persistence ----------------------------------------------------

    _LOG_SCHEMA = "stream_id string, doc string, tombstone boolean, commit_v int"

    def load(self) -> None:
        """Reset to the latest snapshot WITHOUT hydrating descriptors.

        Hydration is lazy: ``get`` pulls one descriptor via a
        partition-pruned point lookup; ``find``/``all`` hydrate the
        full dict on first use (Arrow batch, not per-row py4j). A
        fresh handle's time-to-first-append is therefore O(1 lookup),
        not O(registry) — the eager collect+parse of 1M descriptors
        cost ~47 s on the driver (SCALE.md §1) before any append could
        run."""
        self._streams = {}
        self._snapshot = {}
        self._hydrated = False
        self._resolved_cache: tuple | None = None
        self._sig = self.table.current_version()

    def _resolved(self) -> DataFrame | None:
        """Last-writer-wins view of the delta log AT THE HANDLE'S
        SNAPSHOT VERSION (``self._sig``) as a DataFrame (stream_id,
        doc), tombstones folded out; cached per version. Pinning to
        the load/save-time version — not ``current_version()`` — keeps
        lazy hydration single-snapshot consistent: every ``get``/
        ``find`` on one handle reads the same version, exactly like
        the old eager load, and a racer's later commits become visible
        only through ``load()``/``save()`` advancing the pin. Filters
        on ``stream_id`` push below the window (it partitions by
        stream_id), so point lookups prune at the scan."""
        v = self._sig
        if self._resolved_cache is not None and self._resolved_cache[0] == v:
            return self._resolved_cache[1]
        df = None if v is None else self.table.read(version=v)
        if df is None:
            res = None
        else:
            from pyspark.sql import Window

            w = Window.partitionBy("stream_id").orderBy(F.col("commit_v").desc())
            res = (
                df.withColumn("_rn", F.row_number().over(w))
                .where((F.col("_rn") == 1) & ~F.col("tombstone"))
                .select("stream_id", "doc")
            )
        self._resolved_cache = (v, res)
        return res

    def _hydrate_all(self) -> None:
        if self._hydrated:
            return
        from .registry import StreamDescriptor

        res = self._resolved()
        if res is not None:
            # Arrow-batched transfer; locally known sids (mutated,
            # created, or tombstoned since load) are NOT overwritten —
            # a pending delete must not resurrect, a pending edit must
            # not be clobbered by its own last-saved doc.
            pdf = res.toPandas()
            for sid, doc in zip(pdf["stream_id"], pdf["doc"]):
                if sid in self._streams or sid in self._snapshot:
                    continue
                self._streams[sid] = StreamDescriptor.from_json(doc)
                self._snapshot[sid] = json.loads(doc)
        self._hydrated = True

    # -- reads (lazy-hydrating overrides of the JSON registry API) ----

    def get(self, stream_id: str):
        from .exceptions import StreamNotFound

        if stream_id in self._streams:
            return self._streams[stream_id]
        # in _snapshot but not _streams = locally deleted (tombstone
        # pending); fully hydrated and absent = genuinely unknown
        if self._hydrated or stream_id in self._snapshot:
            raise StreamNotFound(stream_id)
        res = self._resolved()
        if res is not None:
            from .registry import StreamDescriptor

            rows = res.where(F.col("stream_id") == stream_id).collect()
            if rows:
                self._streams[stream_id] = StreamDescriptor.from_json(rows[0].doc)
                self._snapshot[stream_id] = json.loads(rows[0].doc)
                return self._streams[stream_id]
        raise StreamNotFound(stream_id)

    def all(self):
        self._hydrate_all()
        return self._streams.values()

    def find(self, query_tags: dict | None = None):
        from .registry import tags_match

        self._hydrate_all()
        return [
            d for d in self._streams.values() if tags_match(query_tags, d.tags)
        ]

    def find_one(self, query_tags: dict):
        from .exceptions import MultipleStreamsReturned, StreamNotFound

        found = self.find(query_tags)
        if not found:
            raise StreamNotFound(json.dumps(query_tags))
        if len(found) > 1:
            raise MultipleStreamsReturned(json.dumps(query_tags))
        return found[0]

    def delete(self, stream_ids: list[str]) -> None:
        from .exceptions import StreamNotFound
        from .registry import StreamRegistry

        # Hydrate each doomed stream's sources first: the shared
        # cleanup edits contributes_to only on sources present in
        # self._streams, and lazy loading must not turn that into a
        # silent skip.
        for sid in stream_ids:
            for src in self.get(sid).derived_from:
                try:
                    self.get(src)
                except StreamNotFound:
                    pass
        StreamRegistry.delete(self, stream_ids)

    def save(self, expect_unchanged: bool = False) -> None:
        if expect_unchanged and self.table.current_version() != self._sig:
            from .exceptions import StreamAppendContended

            raise StreamAppendContended(
                "registry log advanced since load; reload and retry"
            )

        def dirty_rows(commit_v):
            rows = []
            for sid, d in self._streams.items():
                if self._snapshot.get(sid) != d.__dict__:
                    rows.append((sid, d.to_json(), False, commit_v))
            for sid in set(self._snapshot) - set(self._streams):
                rows.append((sid, "{}", True, commit_v))
            return rows

        for _ in range(8):
            # commit_v tags rows with the manifest version the commit
            # will land at. Passing expected_base makes that version
            # AUTHORITATIVE: a racer committing between our read and
            # our append turns into CommitConflict (retry with a fresh
            # tag) instead of our rows landing at a higher version than
            # their tag claims — which would let LWW rows tie on
            # commit_v across writers and make row_number nondeterministic.
            base = self.table.current_version()
            commit_v = (base if base is not None else -1) + 1
            rows = dirty_rows(commit_v)
            if not rows:
                return
            try:
                committed_v = self.table.append(
                    self.spark.createDataFrame(rows, self._LOG_SCHEMA),
                    expected_base=base,
                )
            except CommitConflict:
                if expect_unchanged:
                    from .exceptions import StreamAppendContended

                    raise StreamAppendContended(
                        "registry log advanced during save; reload and retry"
                    ) from None
                continue  # metadata LWW writer: re-tag and retry
            import json as _json

            for sid, j, tomb, _ in rows:
                if tomb:
                    self._snapshot.pop(sid, None)
                else:
                    self._snapshot[sid] = _json.loads(j)
            # pin to OUR commit, not current_version(): a racer landing
            # right after us must not silently advance this handle's
            # snapshot past what its caches reflect
            self._sig = committed_v
            # Opportunistic auto-compaction: every append adds >= 1
            # data file, and read cost grows with the live file count
            # until someone folds the log. Best-effort — a racing
            # writer just means the next save tries again.
            if len(self.table.current_files()) > self.AUTO_COMPACT_FILES:
                try:
                    self.compact()
                except CommitConflict:
                    pass
            return
        raise CommitConflict("registry save: retries exhausted")

    #: live-file threshold above which save() folds the log itself
    AUTO_COMPACT_FILES = 64

    def compact(self) -> None:
        """Fold the delta log to one snapshot commit, Spark-side: the
        LWW-resolved view is rewritten as commit_v=0 rows without
        hydrating a single descriptor on the driver (O(registry) Spark
        work, O(1) driver work). Dirty local state is saved first, so
        the fold never loses an unsaved mutation; tombstones never
        outlive a compaction. The overwrite is CONDITIONAL on the
        snapshot the fold was derived from (``expected_base``) — a
        racer committing in between surfaces as CommitConflict and the
        retry adopts the new snapshot via ``load()`` (safe: everything
        local was just saved), instead of the racer's committed rows
        being silently folded away. Runs automatically from ``save()``
        past ``AUTO_COMPACT_FILES`` live files; callable manually."""
        self.save()
        for _ in range(8):
            base = self._sig
            res = self._resolved()
            rows_df = (
                self.spark.createDataFrame([], self._LOG_SCHEMA)
                if res is None
                else res.select(
                    "stream_id",
                    "doc",
                    F.lit(False).alias("tombstone"),
                    F.lit(0).cast("int").alias("commit_v"),
                )
            )
            try:
                folded_v = self.table.overwrite(rows_df, expected_base=base)
            except CommitConflict:
                self.load()  # racer landed: adopt the new snapshot
                continue
            self._sig = folded_v
            self._resolved_cache = None  # folded file set differs
            return
        raise CommitConflict("registry compact: retries exhausted")


def _install_registry_api():
    """Graft the JSON registry's mutation surface onto
    ``TableStreamRegistry`` — ensure/delete semantics are IDENTICAL by
    design and dispatch through the lazy-hydrating ``get``/``find``
    overrides above (reads differ: the table backend hydrates on
    demand instead of eagerly parsing every descriptor at load)."""
    from .registry import StreamRegistry

    for name in ("ensure", "delete"):
        setattr(TableStreamRegistry, name, StreamRegistry.__dict__[name])


_install_registry_api()
