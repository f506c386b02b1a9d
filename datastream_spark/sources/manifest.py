"""Manifest-based atomic table commits (snapshot isolation without a
lakehouse dependency).

The default store (``tables.py``) gets crash-consistency from
idempotent dynamic-partition overwrites plus a fixed write order (data
before registry watermark). What that does NOT give is atomic
*visibility*: a reader that lists the table directory while a
multi-partition overwrite is in flight can see half-new, half-old
partitions. This module is the swap-in commit protocol for deployments
that need snapshot reads — the same design Delta Lake / Iceberg use,
reduced to its core:

- data files are written to uniquely-named subdirectories and NEVER
  mutated or listed directly;
- a versioned manifest (``_commits/v%08d.json``) names the exact file
  set of each snapshot; readers load the latest manifest and read only
  those files;
- commits are an atomic hard-link of the next version number —
  concurrency is optimistic (two writers racing the same version: one
  wins, the other gets ``CommitConflict`` and retries on the new
  base), and a crash before the link leaves invisible orphan files,
  never a torn table;
- each commit records per-file column min/max footer stats in the
  manifest (Delta data-skipping / Iceberg metrics pruning, reduced to
  the same core), so range reads (``read(where=...)``) and range
  takedowns (``delete_where(prune=...)``) open only the file
  neighborhood their predicate can touch;
- each commit records the table SCHEMA in the manifest (the log, not
  a sampled footer, is authoritative — Delta's schema-in-log rule):
  ``read`` applies it explicitly so old files missing later-added
  columns surface them as NULL with zero extra footer reads, and
  ``append`` refuses a mismatched frame unless ``merge_schema=True``
  widens the log schema (new nullable columns only — a changed type
  or a silently-dropped column never slips through).

Kept deliberately engine-free (POSIX rename/link semantics). On object
stores, versioned-manifest commit maps to conditional PUT; the rest of
the design is unchanged.

Size boundary (swap point): one JSON document per snapshot carries
files + stats + schema, so manifest size is O(files x stat columns).
That is the right trade up to ~100k files; past it, real log designs
amortize exactly this document — Delta's parquet checkpoints,
Iceberg's manifest-list tree — and this module's read/commit seams
(``_manifest_path`` / ``_commit`` / ``files_where``) are where that
swap lands without touching callers.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CommitConflict", "ManifestedTable"]


class CommitConflict(RuntimeError):
    """Another writer committed the version this writer was about to
    claim. Re-read the table and retry the transaction."""


#: Longest string min/max persisted in file stats. Longer values mark
#: the column unusable for that file (a TRUNCATED max is unsafe as an
#: upper bound without Iceberg's truncate-and-increment dance; skipping
#: the column is the conservative move and long strings — document
#: text — are never useful prune keys anyway).
_STATS_MAX_STR = 64


def _norm_temporal(v):
    """Timestamp/date normalized to a ``(tag, iso_string)`` pair whose
    lexicographic order is chronological: timestamps to naive-UTC
    microsecond ISO (the engine's UTC doctrine — parquet stores UTC
    instants and pyarrow surfaces them naive), dates to ISO days. The
    TAG keeps temporal bounds from ever comparing against a plain
    string literal (in JSON they round-trip as 2-lists, which no
    string/numeric stat produces)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("dt", v.isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    return None


def _stat_value(v):
    """Normalize one parquet-footer min/max into its JSON-stable form,
    or None when the value can't serve as a prune bound (non-UTF-8
    bytes, non-finite floats, exotic logical types, oversized
    strings)."""
    import math

    t = _norm_temporal(v)
    if t is not None:
        return t
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, bool) or isinstance(v, int):
        return v
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if isinstance(v, str):
        return v if len(v) <= _STATS_MAX_STR else None
    return None


def _all_nullable(dt):
    """The type with every nullability flag forced true, recursively.
    Logged schemas are normalized this way: a computed frame marks
    literal/aggregate columns non-null while the same data read back
    from parquet is all-nullable, so raw nullability would make
    byte-identical appends spuriously 'differ' — and an all-nullable
    read schema is always safe."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _all_nullable(f.dataType), True, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_all_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_all_nullable(dt.keyType), _all_nullable(dt.valueType), True)
    return dt


def _file_stats(path: str) -> dict | None:
    """Footer-only per-file column stats: ``{"rows": n, "cols": {name:
    [min, max] | None}}`` — None marks a column present but unusable
    for pruning. Reads ONLY parquet footers (the same metadata
    Iceberg's metrics collection persists), never data pages; in a
    distributed deployment the writing tasks would emit these with the
    files, this is the driver-local equivalent with identical
    semantics. Returns None when pyarrow is unavailable (manifests
    then simply carry no stats — every reader keeps every file)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in here
        return None
    md = pq.ParquetFile(path).metadata
    cols: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:
                continue  # nested leaf — top-level pruning only
            if cols.get(name, ()) is None:
                continue  # already marked unusable
            st = c.statistics
            if st is None or not st.has_min_max:
                # an all-NULL chunk constrains nothing (NULL never
                # satisfies a comparison conjunct) — skip it; a chunk
                # with values but no min/max poisons the column
                if st is not None and st.null_count == st.num_values:
                    continue
                cols[name] = None
                continue
            mn, mx = _stat_value(st.min), _stat_value(st.max)
            if mn is None or mx is None or type(mn) is not type(mx):
                cols[name] = None
                continue
            prev = cols.get(name)  # unusable (None) handled above, so
            # None here means "first chunk with stats for this column"
            if prev is not None and type(prev[0]) is not type(mn):
                cols[name] = None
                continue
            cols[name] = (
                [mn, mx]
                if prev is None
                else [min(prev[0], mn), max(prev[1], mx)]
            )
    return {"rows": md.num_rows, "cols": cols}


def _file_may_match(stats: dict | None, where: list[tuple]) -> bool:
    """Conservative footer-stats prune for one file against an AND of
    ``(column, op, literal)`` conjuncts — False ONLY when the file
    provably holds no matching row (each conjunct is a comparison,
    which NULL never satisfies, so null-heavy files prune on their
    non-null range). Missing stats, unusable columns, or a
    type-mismatched literal keep the file."""
    if not stats:
        return True
    cols = stats.get("cols", {})
    for col, op, val in where:
        b = cols.get(col)
        if b is None:
            # unusable stats or column absent — either way can't prune
            continue
        mn, mx = b
        if isinstance(mn, (list, tuple)):
            # tagged temporal bounds: prune only against a matching
            # datetime/date literal, normalized identically
            nv = _norm_temporal(val)
            if nv is None or nv[0] != mn[0] or nv[0] != mx[0]:
                continue
            mn, mx, val = mn[1], mx[1], nv[1]
        else:
            both_num = isinstance(mn, (int, float)) and isinstance(
                val, (int, float)
            ) and not isinstance(mn, bool) and not isinstance(val, bool)
            if not both_num and type(mn) is not type(val):
                continue
        if op == "=" and not (mn <= val <= mx):
            return False
        if op == "<" and not (mn < val):
            return False
        if op == "<=" and not (mn <= val):
            return False
        if op == ">" and not (mx > val):
            return False
        if op == ">=" and not (mx >= val):
            return False
        if op == "!=" and mn == val == mx:
            return False
    return True


class ManifestedTable:
    """A parquet table whose visible state is defined by its latest
    manifest, not by directory listing.

    ``append``/``overwrite`` are each ONE atomic commit: readers see
    the entire write or none of it, regardless of how many files or
    partitions it spans. ``read()`` of an empty log returns None.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.commits_dir = os.path.join(root, "_commits")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.commits_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest log -------------------------------------------------

    def _versions(self) -> list[int]:
        return sorted(
            int(f[1:9])
            for f in os.listdir(self.commits_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.commits_dir, f"v{version:08d}.json")

    def current_files(self) -> list[str]:
        v = self.current_version()
        if v is None:
            return []
        with open(self._manifest_path(v)) as f:
            return json.load(f)["files"]

    def _commit(
        self,
        files: list[str],
        base_version: int | None,
        meta: dict | None = None,
        stats: dict | None = None,
        schema: str | None = None,
    ) -> int:
        """Atomically publish ``files`` as the next snapshot.

        The version claim is ``os.link`` of a temp manifest to the next
        version number — link (unlike rename) FAILS if the target
        exists, which is exactly the optimistic-concurrency check: a
        racing writer that claimed the version first surfaces as
        ``CommitConflict``, never as a silently overwritten manifest.

        ``meta`` rides in the manifest document under ``"meta"`` —
        writer-supplied commit metadata (e.g. the streaming sink's
        (sink_id, batch_id) idempotence marker). Readers that don't
        know the key ignore it; older manifests simply lack it.
        """
        next_v = (base_version if base_version is not None else -1) + 1
        doc: dict = {"version": next_v, "files": sorted(files)}
        if meta:
            doc["meta"] = dict(meta)
        if stats:
            # keyed by file path; only files in this snapshot ride along
            doc["stats"] = {f: stats[f] for f in files if f in stats}
        if schema is not None:
            doc["schema"] = schema
        tmp = os.path.join(self.commits_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_path(next_v))
        except FileExistsError:
            raise CommitConflict(
                f"version {next_v} already committed by another writer"
            ) from None
        finally:
            os.unlink(tmp)
        return next_v

    # -- data ---------------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df's parquet files under a unique snapshot directory
        and return their paths. Nothing here is visible to readers —
        a crash after this point leaves orphans for vacuum()."""
        sub = os.path.join(self.data_dir, uuid.uuid4().hex)
        # Spark's default INT96 timestamps carry NO parquet min/max
        # stats (deprecated physical type) — write the modern
        # TIMESTAMP_MICROS instead so temporal columns are prunable,
        # exactly what lakehouse writers do for data-skipping. Scoped
        # set-and-restore: the conf is session-global.
        conf = self.spark.conf
        key = "spark.sql.parquet.outputTimestampType"
        prev = conf.get(key)
        conf.set(key, "TIMESTAMP_MICROS")
        try:
            df.write.parquet(sub)
        finally:
            conf.set(key, prev)
        return [
            os.path.join(sub, f)
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        ]

    @staticmethod
    def _stats_for(files: list[str]) -> dict:
        """Footer-only stats for freshly written files (see
        ``_file_stats``) — O(#files) metadata reads, no data pages.
        Large commits read footers on a thread pool (pure I/O +
        pyarrow C++, so the GIL doesn't serialize it); in a
        distributed deployment the writing tasks would emit stats
        with the files and this driver-side pass disappears
        entirely."""
        if len(files) <= 16:
            pairs = [(f, _file_stats(f)) for f in files]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=16) as ex:
                pairs = list(zip(files, ex.map(_file_stats, files)))
        return {f: s for f, s in pairs if s is not None}

    def _stats_at(self, version: int | None) -> dict:
        """The stats map the given manifest carries ({} for versions
        committed before stats existed — readers then keep every
        file)."""
        if version is None:
            return {}
        with open(self._manifest_path(version)) as f:
            return json.load(f).get("stats", {})

    def _schema_at(self, version: int | None) -> str | None:
        """The schema JSON the given manifest records (None for
        pre-schema manifests — readers then fall back to footer
        sampling, today's behavior)."""
        if version is None:
            return None
        with open(self._manifest_path(version)) as f:
            return json.load(f).get("schema")

    def _reader(self, schema_json: str | None):
        """A parquet reader applying the LOG's schema when the
        manifest records one — the log, not a sampled footer, is
        authoritative (Delta's schema-in-log rule), so files written
        before a column was added surface it as NULL with zero extra
        footer reads."""
        from pyspark.sql.types import StructType

        r = self.spark.read
        if schema_json is not None:
            r = r.schema(StructType.fromJson(json.loads(schema_json)))
        return r

    def _merged_schema(
        self, prior_json: str | None, df: DataFrame, merge_schema: bool
    ) -> str:
        """The schema the next commit should record, refusing silent
        drift: equal schemas pass through; with ``merge_schema=True``
        NEW columns widen the log schema (appended, forced nullable)
        and MISSING columns are tolerated (the log keeps them, the new
        files surface NULL); a changed type on a shared column always
        refuses; any difference without the flag refuses."""
        from pyspark.sql.types import StructField, StructType

        if prior_json is None:
            return _all_nullable(df.schema).json()
        prior = _all_nullable(StructType.fromJson(json.loads(prior_json)))
        new = _all_nullable(df.schema)
        if prior == new:
            return prior.json()
        prior_by_name = {f.name: f for f in prior.fields}
        conflicts = [
            f.name
            for f in new.fields
            if f.name in prior_by_name
            and prior_by_name[f.name].dataType != f.dataType
        ]
        if conflicts:
            raise ValueError(
                f"append: column type changed for {conflicts} — a type "
                "change never merges; rewrite the table (overwrite) if "
                "this is intentional"
            )
        added = [f.name for f in new.fields if f.name not in prior_by_name]
        missing = [
            f.name for f in prior.fields
            if f.name not in {g.name for g in new.fields}
        ]
        if not added and not missing:
            # same columns, different ORDER: harmless — the parquet
            # reader resolves columns by NAME; the log's order stands
            return prior.json()
        if not merge_schema:
            raise ValueError(
                "append: frame schema differs from the table schema "
                f"(added {added}, missing {missing}) — reading would "
                "silently NULL or drop columns; pass merge_schema=True "
                "to widen the log schema instead"
            )
        merged = StructType(
            list(prior.fields)
            + [
                StructField(f.name, f.dataType, True, f.metadata)
                for f in new.fields
                if f.name not in prior_by_name
            ]
        )
        return merged.json()

    _UNSET = object()

    def append(
        self,
        df: DataFrame,
        expected_base=_UNSET,
        meta: dict | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Append df as one atomic commit.

        ``expected_base`` (a version number or None-for-empty) makes the
        commit conditional on the log still being at that version: if a
        racer landed in between, the claim of ``expected_base + 1``
        fails with ``CommitConflict`` instead of silently committing at
        a higher version. Callers that tag their rows with the version
        they expect to land at (e.g. the stream registry's LWW
        ``commit_v``) MUST pass it, or a racer can make the tag lie.
        ``meta`` is writer commit metadata carried in the manifest
        (see ``_commit``).

        A frame whose schema differs from the table's logged schema
        REFUSES (reading a mixed table silently NULLs or drops
        columns); ``merge_schema=True`` widens the log schema instead
        — new columns append (forced nullable, old files read NULL),
        missing columns tolerated, a changed TYPE never merges.
        """
        if expected_base is self._UNSET:
            base = self.current_version()
        else:
            base = expected_base
            # fail fast (cheap listing) before paying the parquet write
            if self.current_version() != base:
                raise CommitConflict(
                    f"expected base {base}, log has advanced"
                )
        if base is None:
            prior: list[str] = []
        else:
            with open(self._manifest_path(base)) as f:
                prior = json.load(f)["files"]
        schema = self._merged_schema(self._schema_at(base), df, merge_schema)
        new_files = self._write_files(df)
        stats = {**self._stats_at(base), **self._stats_for(new_files)}
        return self._commit(
            prior + new_files, base, meta=meta, stats=stats, schema=schema
        )

    def overwrite(self, df: DataFrame, expected_base=_UNSET) -> int:
        """Replace the table as one atomic commit. ``expected_base``
        makes it conditional exactly like ``append``: a writer whose
        df was DERIVED from snapshot v must pass v, or a racer's
        commit landing in between would be silently folded away
        instead of surfacing as CommitConflict."""
        if expected_base is self._UNSET:
            base = self.current_version()
        else:
            base = expected_base
            if self.current_version() != base:
                raise CommitConflict(
                    f"expected base {base}, log has advanced"
                )
        new_files = self._write_files(df)
        return self._commit(
            new_files,
            base,
            stats=self._stats_for(new_files),
            schema=_all_nullable(df.schema).json(),  # overwrite REDEFINES the table
        )

    def delete_where(self, condition, prune: list[tuple] | None = None) -> int:
        """Remove matching rows by rewriting ONLY the files that hold
        them — the partition-rewrite pattern at file granularity, the
        takedown primitive the near-dup maintainers consume. Untouched
        files ride into the next manifest verbatim, so a change-feed
        consumer (``cdc.table_changes``) sees a pure DELETE for the
        doomed rows and delete+insert only for rows co-located in a
        rewritten file; at 100 TB the rewrite cost is the doomed rows'
        file neighborhood, never the table. Returns the new version
        (the current one, unchanged, when nothing matched).

        ``condition`` is a Column predicate over the table's rows. It
        MUST be deterministic: it is evaluated twice — a detection
        pass to find the hit files, then again over those files to
        write the survivors — so a non-deterministic predicate
        (``rand()``, wall-clock time) can doom a file on the first
        pass yet keep/delete a DIFFERENT row set on the second,
        silently corrupting the rewrite. Cost shape: the detection
        pass scans the candidate files (Catalyst pushes the predicate
        to the parquet scan, but every candidate is opened); only the
        REWRITE is bounded by the doomed rows' file neighborhood.
        Batch takedowns accordingly (one call per consolidated
        predicate, not per id).

        ``prune`` bounds the detection pass with footer stats: an AND
        of ``(column, op, literal)`` conjuncts (see ``files_where``)
        that the caller guarantees every CONDITION-matching row
        satisfies — files whose stats refute a conjunct are skipped
        without opening, so a time- or id-range takedown on a
        range-clustered table touches only its file neighborhood
        instead of the whole table. The implication contract is the
        caller's (same as a partition predicate on a partitioned
        DELETE): a ``prune`` the condition does not imply silently
        KEEPS doomed rows in pruned files."""
        base = self.current_version()
        if base is None:
            raise ValueError("delete_where: the table has no snapshot yet")
        all_files = self.current_files()
        files = (
            self.files_where(prune, version=base) if prune else all_files
        )
        if not files:
            return base
        schema = self._schema_at(base)
        tagged = self._reader(schema).parquet(*files).withColumn(
            "_src_file", F.input_file_name()
        )
        # control-plane read: one distinct-file row per file containing
        # a match (<= #files rows), not the matching rows themselves
        hit_uris = [
            r["_src_file"]
            for r in tagged.where(condition)
            .select("_src_file")
            .distinct()
            .collect()
        ]
        if not hit_uris:
            return base
        # input_file_name() yields percent-encoded URIs (file://...)
        # while manifests store raw (possibly relative) paths — compare
        # both sides normalized to absolute decoded paths, and read the
        # hit files back via their MANIFEST form. A raw string compare
        # here silently keeps the doomed file AND appends its rewritten
        # survivors (duplicating rows) whenever the root is relative or
        # the path holds a space/percent/non-ASCII char.
        hit_abs = {
            os.path.abspath(unquote(urlparse(u).path) or u)
            for u in hit_uris
        }
        hit_orig = [f for f in files if os.path.abspath(f) in hit_abs]
        if len(hit_orig) != len(hit_abs):
            raise RuntimeError(
                "delete_where: could not map every hit file URI back to "
                f"a manifest path ({len(hit_orig)} of {len(hit_abs)}) — "
                "refusing rather than leaving doomed rows visible"
            )
        # keep set derives from ALL files — prune-skipped files ride
        # into the next manifest verbatim, exactly like unhit ones
        keep_files = [
            f for f in all_files if os.path.abspath(f) not in hit_abs
        ]
        # NULL-predicate rows are NOT matches and must SURVIVE: a bare
        # ~condition filters them out (NULL stays NULL under NOT),
        # silently deleting rows the predicate never selected.
        survivors = self._reader(schema).parquet(*sorted(hit_orig)).where(
            ~F.coalesce(condition, F.lit(False))
        )
        # written unconditionally — a pre-write emptiness probe would
        # be a third full read of the hit files (detection + probe +
        # write); an all-doomed rewrite just yields empty parquet
        # files, which readers handle fine
        new_files = self._write_files(survivors)
        stats = {**self._stats_at(base), **self._stats_for(new_files)}
        return self._commit(
            keep_files + new_files, base, stats=stats, schema=schema
        )

    def files_where(
        self, where: list[tuple], version: int | None = None
    ) -> list[str]:
        """The snapshot's files that MAY hold rows matching the AND of
        ``(column, op, literal)`` conjuncts (ops ``= != < <= > >=``),
        pruned by the per-file footer stats each commit records — the
        manifest-level half of predicate pushdown (Delta data-skipping
        / Iceberg metrics pruning). Strictly conservative: a file is
        dropped only when its min/max provably refute a conjunct;
        files from pre-stats manifests, unusable columns (nested,
        non-UTF-8, >64-char strings, non-finite floats), or
        type-mismatched literals are all kept. Timestamp/date columns
        prune against ``datetime``/``date`` literals; per the engine's
        UTC doctrine a NAIVE datetime literal is taken as UTC (pass a
        tz-aware one to be explicit — it is normalized to UTC). At 100 TB this is the
        difference between opening every footer of a table and
        opening the file neighborhood of a range predicate — provided
        writes are range-clustered (time-ordered appends cluster
        naturally; sort before writing for anything else)."""
        bad = [c for c in where if c[1] not in ("=", "!=", "<", "<=", ">", ">=")]
        if bad:
            raise ValueError(
                f"files_where: unsupported op in {bad} — a typo here "
                "would silently skip pruning, so refuse instead"
            )
        if version is None:
            version = self.current_version()
        if version is None:
            return []
        with open(self._manifest_path(version)) as f:
            doc = json.load(f)
        stats = doc.get("stats", {})
        return [
            f
            for f in doc["files"]
            if _file_may_match(stats.get(f), where)
        ]

    def read(
        self,
        version: int | None = None,
        where: list[tuple] | None = None,
    ) -> DataFrame | None:
        """The snapshot the given (default: latest) manifest names —
        stable even while concurrent commits land. ``where`` (an AND
        of ``(column, op, literal)`` conjuncts) prunes the scan to
        ``files_where``'s candidates AND applies the residual
        predicate row-wise, so the result is exact regardless of how
        much the stats pruned."""
        if version is None:
            version = self.current_version()
        if version is None:
            return None
        with open(self._manifest_path(version)) as f:
            doc = json.load(f)
        files = doc["files"]
        if not files:
            return None
        reader = self._reader(doc.get("schema"))
        out = None
        if where:
            cand = self.files_where(where, version=version)
            if cand:
                out = reader.parquet(*cand)
            else:
                # schema-stable empty frame: one footer read, no rows
                out = reader.parquet(files[0]).where(F.lit(False))
            ops = {
                "=": "__eq__", "!=": "__ne__", "<": "__lt__",
                "<=": "__le__", ">": "__gt__", ">=": "__ge__",
            }
            for col, op, val in where:
                if op not in ops:
                    raise ValueError(f"read: unsupported op {op!r}")
                out = out.where(getattr(F.col(col), ops[op])(F.lit(val)))
            return out
        return reader.parquet(*files)

    def _zorder_ranks(self, df: DataFrame, zorder: list[str], bits: int):
        """Min/max-scale each clustering column into the Morton
        domain [0, 2^bits): ``z_value`` CLAMPS raw values, so a
        wide-range key (64-bit ids, epoch timestamps) would collapse
        into the top corner and carry no clustering at all.
        Numeric/timestamp/date columns only (a string has no range
        semantics a Morton code can use — sort_by handles it); one
        min/max agg over the clustering columns is the only extra
        job, trivial next to the rewrite itself. Uniform scaling, not
        quantile ranks: a heavily skewed key clusters less evenly
        (documented trade — quantile ranks would cost a per-column
        sort or sampled boundaries)."""
        from pyspark.sql.types import (
            DateType,
            NumericType,
            TimestampType,
        )

        fields = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for c in zorder:
            dt = fields.get(c)
            if dt is None:
                raise ValueError(f"optimize: zorder column {c!r} not found")
            if isinstance(dt, (TimestampType, DateType)):
                cols.append(F.col(c).cast("timestamp").cast("double"))
            elif isinstance(dt, NumericType):
                cols.append(F.col(c).cast("double"))
            else:
                raise ValueError(
                    f"optimize: zorder column {c!r} has type {dt.simpleString()} "
                    "— Morton clustering needs range semantics; use "
                    "sort_by for strings"
                )
        row = df.agg(
            *[F.min(e).alias(f"_mn{i}") for i, e in enumerate(cols)],
            *[F.max(e).alias(f"_mx{i}") for i, e in enumerate(cols)],
        ).collect()[0]
        top = float((1 << bits) - 1)
        ranks = []
        for i, e in enumerate(cols):
            mn, mx = row[f"_mn{i}"], row[f"_mx{i}"]
            if mn is None or mx is None or mx <= mn:
                ranks.append(F.when(e.isNull(), None).otherwise(F.lit(0)))
                continue
            span = float(mx) - float(mn)
            ranks.append((e - F.lit(float(mn))) / F.lit(span) * F.lit(top))
        return ranks

    def optimize(
        self,
        zorder: list[str] | None = None,
        sort_by: list[str] | None = None,
        bits: int = 16,
        target_file_bytes: int = 128 << 20,
        expected_base=_UNSET,
    ) -> int:
        """Rewrite the whole snapshot as one atomic commit with a
        better physical layout — the manifest-level OPTIMIZE:

        - default: pure bin-packing of the SMALL files (those under
          ``target_file_bytes / 2``) toward ``target_file_bytes`` — no
          shuffle, no row change, and files already near target ride
          into the next manifest untouched (Delta OPTIMIZE's skip
          rule: without it, a growing streaming table would rewrite
          its whole packed head on every pack — O(N²) lifetime write
          amplification);
        - ``sort_by=[cols]``: range-cluster on the columns (one range
          exchange + in-partition sort), so the footer stats each
          commit records prune range predicates on those columns;
        - ``zorder=[cols]``: Morton-interleave clustering
          (``operators.layout.z_value``) — every file covers a compact
          hyper-rectangle, so stats prune on EVERY interleaved column
          at once. Any numeric/timestamp/date column works: values are
          min/max-scaled into the Morton domain first
          (``_zorder_ranks``), so wide-range keys cluster instead of
          clamping into one corner; strings refuse (no range
          semantics — use ``sort_by``).

        The commit records ``data_change: false`` in its manifest meta
        and ``cdc.table_changes`` SKIPS such commits entirely (the
        file set changed, the rows did not — replaying a layout
        rewrite as delete+insert churn would make every incremental
        maintainer re-verify the whole corpus, Delta's
        dataChange=false semantics). ``expected_base`` gives the same
        optimistic-concurrency conditioning as ``append``: a writer
        landing mid-rewrite surfaces as ``CommitConflict``, never as
        lost rows. Old snapshots stay readable until ``expire`` +
        ``vacuum`` reclaim the un-packed files."""
        if zorder and sort_by:
            raise ValueError("optimize: pass zorder OR sort_by, not both")
        if expected_base is self._UNSET:
            base = self.current_version()
        else:
            base = expected_base
            if self.current_version() != base:
                raise CommitConflict(
                    f"expected base {base}, log has advanced"
                )
        if base is None:
            raise ValueError("optimize: the table has no snapshot yet")
        files = self.current_files()
        if not files:
            return base
        schema = self._schema_at(base)
        keep: list[str] = []
        if not zorder and not sort_by:
            # bin-pack only the small-file tail; near-target files are
            # already optimal and ride through untouched (clustering
            # rewrites stay global — that's their point)
            small = [
                f for f in files
                if os.path.getsize(f) < target_file_bytes // 2
            ]
            if len(small) <= 1:
                return base  # nothing worth packing
            keep = [f for f in files if f not in set(small)]
            files = small
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, -(-total // max(1, target_file_bytes)))
        df = self._reader(schema).parquet(*files)
        if zorder:
            from ..operators.layout import z_value

            z = z_value(self._zorder_ranks(df, zorder, bits), bits=bits)
            df = (
                df.withColumn("_z", z)
                .repartitionByRange(n_out, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        elif sort_by:
            df = df.repartitionByRange(
                n_out, *[F.col(c) for c in sort_by]
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n_out)
        new_files = self._write_files(df)
        stats = {**self._stats_at(base), **self._stats_for(new_files)}
        return self._commit(
            keep + new_files,
            base,
            meta={"data_change": False},
            stats=stats,
            schema=schema,
        )

    def expire(self, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` manifest versions so
        ``vacuum`` can reclaim the files only those snapshots pinned
        (the retention knob every manifest-log design needs). Returns
        manifests removed."""
        vs = self._versions()
        removed = 0
        for v in vs[: max(0, len(vs) - keep_last)]:
            os.unlink(self._manifest_path(v))
            removed += 1
        return removed

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Delete data files no manifest references (crash orphans and
        files dropped by ``overwrite``). Returns files removed.

        Concurrency: a writer between ``_write_files`` and ``_commit``
        has data on disk that NO manifest names yet — exactly what an
        unconditional vacuum would delete, leaving the writer to then
        publish a manifest of dead paths (a torn table). Like Delta's
        retention window, files younger than ``grace_seconds`` are
        skipped, which makes vacuum safe alongside writers whose
        write→commit gap is shorter than the grace period. Pass
        ``grace_seconds=0`` only when no writer is running.
        """
        import time

        live: set[str] = set()
        for v in self._versions():
            with open(self._manifest_path(v)) as f:
                live.update(json.load(f)["files"])
        cutoff = time.time() - grace_seconds
        removed = 0
        for sub in os.listdir(self.data_dir):
            subdir = os.path.join(self.data_dir, sub)
            for fn in os.listdir(subdir):
                p = os.path.join(subdir, fn)
                if p.endswith(".parquet") and p not in live:
                    try:
                        if os.path.getmtime(p) > cutoff:
                            continue  # inside a possibly-open commit window
                    except OSError:
                        continue  # raced another vacuum; already gone
                    os.unlink(p)
                    removed += 1
            # Spark's local-FS writer leaves _SUCCESS / .crc markers, so
            # "no parquet left" is the real emptiness test — clear the
            # markers and drop the snapshot dir once its data is gone.
            left = os.listdir(subdir)
            if left and not any(n.endswith(".parquet") for n in left):
                if all(n == "_SUCCESS" or n.endswith(".crc") for n in left):
                    shutil.rmtree(subdir)
            elif not left:
                shutil.rmtree(subdir)
        return removed
