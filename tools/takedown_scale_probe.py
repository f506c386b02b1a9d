"""End-to-end takedown-protocol measurement at scale (SCALE.md §21).

Drives the round-8 delete-aware maintenance path over a real corpus:

1. land the sf documents table in a ManifestedTable (one commit),
2. bootstrap the LSH band table (untimed — amortized materialized
   state, §19 doctrine),
3. ``delete_where`` a 1% takedown slice (timed: file-granular rewrite),
4. run ``incremental_lsh_pairs`` over the delete range (timed: netting
   + survivor verification + tombstone commit; returns zero pairs),
5. ingest a fresh 1% delta and maintain (timed: the hot path now pays
   the marker anti-join — the number that must stay O(delta)),
6. ``compact_band_tombstones`` (timed: the one table-sized rewrite,
   explicitly deferrable),
7. verify live bands == from-scratch banding of the surviving corpus
   (exceptAll both ways — the parity pin at scale).

Usage: python tools/takedown_scale_probe.py [sf_dir] [mod] [mode]
``mode`` is ``localized`` (default: the corpus lands range-partitioned
on doc_id and the takedown dooms one contiguous 1/mod slice — the real
shape of a domain/date takedown, which hits FEW files, so survivor
verification re-hashes only the rewrite neighborhood) or
``scattered`` (doom ids uniform across every file — the worst case:
every file rewrites and survivor verification re-hashes ~the corpus).
Prints one JSON line with per-step seconds and the parity verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datastream_spark.operators.dedup import (  # noqa: E402
    band_key_frame,
    minhash_signature_arrays,
)
from datastream_spark.session import get_spark  # noqa: E402
from datastream_spark.sources import cdc  # noqa: E402
from datastream_spark.sources.manifest import ManifestedTable  # noqa: E402

GEO = dict(num_hashes=32, rows_per_band=16, shingle_k=3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf10"
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 100  # 1% takedown
    mode = sys.argv[3] if len(sys.argv) > 3 else "localized"

    spark = get_spark("takedown-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="takedown_")
    out: dict = {
        "sf_dir": sf_dir,
        "takedown_pct": round(100.0 / mod, 2),
        "mode": mode,
    }
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n = docs.count()
        out["n_docs"] = n
        # hold back a fresh-ingest slice so step 5 has genuinely new ids
        ingest = docs.where(F.col("doc_id") % mod == 1)
        base = docs.where(F.col("doc_id") % mod != 1)
        if mode == "localized":
            # the corpus lands range-partitioned on id (any real table
            # has SOME locality — domain, crawl date, shard); the doom
            # predicate is one contiguous 1/mod slice of the id space
            base = base.repartitionByRange(32, "doc_id")
            doom = (F.col("doc_id") >= 0) & (F.col("doc_id") < n // mod)
        else:
            doom = F.col("doc_id") % mod == 0

        dt = ManifestedTable(spark, os.path.join(work, "docs"))
        bt = ManifestedTable(spark, os.path.join(work, "bands"))
        dt.append(base)

        t0 = time.perf_counter()
        cdc.incremental_lsh_pairs(
            dt, bt, since=None, portable_hash=False, **GEO
        ).count()
        out["bootstrap_s"] = round(time.perf_counter() - t0, 2)
        out["band_rows"] = bt.read().count()

        n_files_before = len(dt.current_files())
        v1 = dt.current_version()
        t0 = time.perf_counter()
        dt.delete_where(doom)
        out["delete_where_s"] = round(time.perf_counter() - t0, 2)
        out["files_total"] = n_files_before
        out["files_hit"] = len(
            set(cdc.files_at(dt, v1)) - set(dt.current_files())
        )

        t0 = time.perf_counter()
        p = cdc.incremental_lsh_pairs(
            dt, bt, since=v1, portable_hash=False, **GEO
        )
        out["tombstone_pairs"] = int(p.count()) if p is not None else None
        out["tombstone_maint_s"] = round(time.perf_counter() - t0, 2)
        out["n_tombstoned"] = (
            bt.read()
            .where(F.col("band") == cdc.TOMBSTONE_BAND)
            .select("doc_id")
            .distinct()
            .count()
        )

        v2 = dt.current_version()
        dt.append(ingest)
        t0 = time.perf_counter()
        p2 = cdc.incremental_lsh_pairs(
            dt, bt, since=v2, portable_hash=False, **GEO
        )
        out["ingest_pairs"] = int(p2.count())
        out["ingest_maint_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        out["n_compacted"] = cdc.compact_band_tombstones(bt)
        out["compact_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        want = band_key_frame(
            minhash_signature_arrays(
                dt.read(),
                "doc_id",
                "text",
                num_hashes=GEO["num_hashes"],
                shingle_k=GEO["shingle_k"],
                portable_hash=False,
            ),
            "doc_id",
            GEO["rows_per_band"],
        ).select("doc_id", "band", "band_hash")
        got = bt.read().select("doc_id", "band", "band_hash")
        out["parity_ok"] = (
            got.exceptAll(want).limit(1).count() == 0
            and want.exceptAll(got).limit(1).count() == 0
        )
        out["verify_s"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(out))
        assert out["parity_ok"], "live bands != rebuild on survivors"
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
