"""Stream registry: the ``streams`` dimension table.

Parity target: the reference's Stream metadata documents
(datastream/backends/mongodb.py:~200-760, API surface
datastream/api.py:~300-420 — SURVEY.md §1.1, §2.1 S1/S5/S6).

Design: streams are *data*, not schema — the registry is a small
dimension table (one row per stream). Metadata operations are
driver-side (pyarrow read/write of one parquet file); the data path
gets the registry as a broadcast-able Spark DataFrame when it needs a
join (e.g. batch monotonicity validation). At 100 TB the fact tables
are huge but the registry stays millions-of-rows small — driver-side
find-or-create is the right altitude, exactly like the reference's
single-document Mongo ops.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable

from .exceptions import (
    InconsistentStreamConfiguration,
    MultipleStreamsReturned,
    StreamNotFound,
)
from .granularity import granularity_by_name
from .operators.rollup import TIME_DOWNSAMPLERS, expand_downsamplers

VALUE_TYPES = ("numeric", "nominal", "graph")


def _flatten(d: dict, prefix: str = "") -> dict[str, Any]:
    """Flatten nested tag dicts to Mongo-style dotted paths."""
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def tags_match(query_tags: dict | None, tags: dict) -> bool:
    """Subset match with dotted-path semantics (mongodb.py:~720 [MED])."""
    if not query_tags:
        return True
    flat = _flatten(tags)
    for k, v in _flatten(query_tags).items():
        if flat.get(k) != v:
            return False
    return True


@dataclass
class StreamDescriptor:
    stream_id: str
    tags: dict
    value_downsamplers: list[str]
    highest_granularity: str
    value_type: str = "numeric"
    #: backend-specific value-type options (reference api.py:~300
    #: ``value_type_options`` [MED]) — stored verbatim
    value_type_options: dict | None = None
    derived_from: list[str] = field(default_factory=list)
    derive_op: str | None = None
    derive_args: dict | None = None
    contributes_to: list[str] = field(default_factory=list)
    earliest_us: int | None = None
    latest_us: int | None = None
    #: per-granularity watermark: bucket_epoch (s) below which rollups
    #: are finalized (reference ``downsampled_until`` [MED])
    downsampled_until: dict[str, int] = field(default_factory=dict)
    #: per-source µs watermark for derived streams: outputs incorporate
    #: source rows with ts <= this (reference mongodb.py
    #: ``_process_contributes_to`` tail state [MED]); empty until the
    #: first (back)process — the recompute then runs in full.
    derive_src_state: dict[str, int] = field(default_factory=dict)
    pending_backprocess: bool = False
    #: True once the stream receives dict-of-downsampled-values appends
    #: (reference pre-aggregated appends for coarse granularities,
    #: mongodb.py:~850 [MED]); its "raw" level then lives in
    #: rollup_<highest_granularity>, not the datapoints table.
    preaggregated: bool = False

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "StreamDescriptor":
        return cls(**json.loads(s))


class StreamRegistry:
    """Find-or-create + persistence for stream descriptors.

    Persisted as one JSON-lines file under the store root (atomic
    rename on save). Swap-in point for Delta MERGE when a transactional
    multi-writer registry is needed.
    """

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "streams.jsonl")
        self._streams: dict[str, StreamDescriptor] = {}
        self.load()

    def load(self) -> None:
        self._streams = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        d = StreamDescriptor.from_json(line)
                        self._streams[d.stream_id] = d
        self._sig = self._file_sig()

    def _file_sig(self):
        try:
            st = os.stat(self.path)
            return (st.st_mtime_ns, st.st_size)
        except FileNotFoundError:
            return None

    def save(self, expect_unchanged: bool = False) -> None:
        """Persist all descriptors (atomic rename).

        ``expect_unchanged=True`` is the optimistic-concurrency check
        the append path uses (reference ``StreamAppendContended``
        [MED], SURVEY §3 E1): if another writer saved the registry
        since we last loaded/saved it, committing our snapshot would
        silently drop their watermarks/latest pointers — raise instead
        (the caller reloads and retries). Metadata-only writers
        (ensure_stream etc.) keep last-writer-wins semantics."""
        if expect_unchanged and self._file_sig() != self._sig:
            from .exceptions import StreamAppendContended

            raise StreamAppendContended(
                "registry changed on disk since load; reload and retry"
            )
        os.makedirs(self.root, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for d in self._streams.values():
                f.write(d.to_json() + "\n")
        os.replace(tmp, self.path)
        self._sig = self._file_sig()

    def get(self, stream_id: str) -> StreamDescriptor:
        try:
            return self._streams[stream_id]
        except KeyError:
            raise StreamNotFound(stream_id) from None

    def find(self, query_tags: dict | None = None) -> list[StreamDescriptor]:
        return [d for d in self._streams.values() if tags_match(query_tags, d.tags)]

    def find_one(self, query_tags: dict) -> StreamDescriptor:
        found = self.find(query_tags)
        if not found:
            raise StreamNotFound(json.dumps(query_tags))
        if len(found) > 1:
            raise MultipleStreamsReturned(json.dumps(query_tags))
        return found[0]

    def all(self) -> Iterable[StreamDescriptor]:
        return self._streams.values()

    def ensure(
        self,
        query_tags: dict,
        tags: dict | None,
        value_downsamplers: list[str],
        highest_granularity: str,
        value_type: str = "numeric",
        value_type_options: dict | None = None,
        derived_from: list[str] | None = None,
        derive_op: str | None = None,
        derive_args: dict | None = None,
    ) -> StreamDescriptor:
        """Find-or-create by query_tags (api.py:~300 [HIGH]); raises
        InconsistentStreamConfiguration on config mismatch."""
        granularity_by_name(highest_granularity)  # validates
        downs = expand_downsamplers(value_downsamplers)
        if value_type not in VALUE_TYPES:
            from .exceptions import IncompatibleTypes

            raise IncompatibleTypes(value_type)

        matches = self.find(query_tags)
        if len(matches) > 1:
            raise MultipleStreamsReturned(json.dumps(query_tags))
        if matches:
            d = matches[0]
            if (
                d.highest_granularity != highest_granularity
                or set(downs) != set(d.value_downsamplers)
                or d.value_type != value_type
                or d.derive_op != (derive_op or None)
                or (derived_from or []) != d.derived_from
            ):
                raise InconsistentStreamConfiguration(d.stream_id)
            return d

        d = StreamDescriptor(
            stream_id=str(uuid.uuid4()),
            tags={**query_tags, **(tags or {})},
            value_downsamplers=downs,
            highest_granularity=highest_granularity,
            value_type=value_type,
            value_type_options=value_type_options,
            derived_from=list(derived_from or []),
            derive_op=derive_op,
            derive_args=derive_args,
            pending_backprocess=bool(derive_op),
        )
        self._streams[d.stream_id] = d
        for src in d.derived_from:
            self.get(src).contributes_to.append(d.stream_id)
        self.save()
        return d

    def delete(self, stream_ids: list[str]) -> None:
        from .exceptions import OutstandingDependenciesError

        doomed = set(stream_ids)
        for sid in stream_ids:
            deps = set(self.get(sid).contributes_to) - doomed
            if deps:
                raise OutstandingDependenciesError(f"{sid} -> {sorted(deps)}")
        for sid in stream_ids:
            d = self._streams.pop(sid)
            for src in d.derived_from:
                if src in self._streams:
                    src_d = self._streams[src]
                    src_d.contributes_to = [
                        c for c in src_d.contributes_to if c != sid
                    ]
        self.save()


#: All time downsamplers are always materialized (cheap columns).
__all__ = ["StreamRegistry", "StreamDescriptor", "tags_match", "TIME_DOWNSAMPLERS"]
