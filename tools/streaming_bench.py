"""Streaming-path throughput for the round-6 twins (SCALE.md §13b).

Replays sf1 events as a multi-micro-batch file stream (the §13
methodology: stage N rows as F parquet files, read with
maxFilesPerTrigger, availableNow, noop sink, local[32]) through:

- streaming_kmv_sketch   (bounded bottom-k state per group)
- streaming_check_counters (one-row counter state + stream-static
  ref-integrity flag)
- streaming_interval_join  (watermarked stream-stream inner join)

Usage: python tools/streaming_bench.py [sf_dir] [n_rows] [n_files]
Prints one JSON line {bench: {rows, sec, rows_per_sec, out_rows}}.
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

from datastream_spark.session import get_spark  # noqa: E402


class _RowCounter:
    """Per-batch input-row counts via StreamingQueryListener.

    ``q.recentProgress`` retains only the most recent ~100 progress
    updates, so summing it once at the end silently undercounts any
    run with more triggers than the retention cap. The listener sees
    every progress event; counts are keyed by (query id, batchId) and
    merged with whatever recentProgress still holds (listener delivery
    is async, so a tail event can arrive after awaitTermination — the
    union by batchId is robust to loss on either side)."""

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        counts: dict[tuple[str, int], int] = {}

        class L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                counts[(str(p.id), int(p.batchId))] = int(p.numInputRows)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.counts = counts
        self.listener = L()

    def rows_for(self, q) -> int:
        merged = {
            b: n for (qid, b), n in self.counts.items() if qid == str(q.id)
        }
        for p in q.recentProgress:
            merged.setdefault(int(p.batchId), int(p.numInputRows))
        return sum(merged.values())


def run(spark, stream_df, build, name, checkpoint_root, counter):
    out = build(stream_df)
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("noop")
        .outputMode("complete" if name == "checks" else "append")
        .option(
            "checkpointLocation", os.path.join(checkpoint_root, name)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    sec = time.perf_counter() - t0
    return {"sec": round(sec, 2), "rows": int(counter.rows_for(q))}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark("streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")
    counter = _RowCounter()
    spark.streams.addListener(counter.listener)
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .limit(n_rows)
            .select(
                "event_id", "user_id", "event_type", "value",
                F.col("ts").cast("timestamp").alias("ts"),
            )
        )
        staged = os.path.join(work, "events")
        ev.repartition(n_files).write.parquet(staged)
        schema = spark.read.parquet(staged).schema

        results = {}

        def stream():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 4)
                .parquet(staged)
            )

        from datastream_spark.operators import quality as Q
        from datastream_spark.streaming.joins import streaming_interval_join
        from datastream_spark.streaming.quality import (
            streaming_check_counters,
        )
        from datastream_spark.streaming.sketch import streaming_kmv_sketch

        results["kmv_sketch"] = run(
            spark,
            stream(),
            lambda s: streaming_kmv_sketch(
                s,
                "event_type",
                F.concat_ws(
                    ":",
                    F.col("user_id").cast("string"),
                    F.to_date("ts").cast("string"),
                ),
                k=256,
                portable=False,
            ),
            "kmv",
            work,
            counter,
        )

        # JVM-tier KMV maintenance: foreachBatch -> ManifestedTable
        # (same grouping/element as the Python-state twin above)
        from datastream_spark.sources.manifest import ManifestedTable
        from datastream_spark.streaming.sketch import kmv_foreach_batch_sink

        sink = kmv_foreach_batch_sink(
            ManifestedTable(spark, os.path.join(work, "kmv_fb_tbl")),
            "event_type",
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.to_date("ts").cast("string"),
            ),
            k=256,
            portable=False,
        )
        t0 = time.perf_counter()
        qf = (
            stream()
            .writeStream.foreachBatch(sink)
            .option(
                "checkpointLocation", os.path.join(work, "kmv_fb_ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        qf.awaitTermination(600)
        results["kmv_foreach_batch"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "rows": int(counter.rows_for(qf)),
        }

        users = spark.read.parquet(staged).select("user_id").distinct()
        results["check_counters"] = run(
            spark,
            stream(),
            lambda s: streaming_check_counters(
                s,
                [
                    Q.expect_not_null("event_id"),
                    Q.expect_in_range("value", 0, 1e9),
                    Q.expect_values_in(
                        "event_type",
                        ["view", "click", "purchase", "signup", "error"],
                    ),
                    Q.expect_ref_integrity("user_id", users, "user_id"),
                ],
            ),
            "checks",
            work,
            counter,
        )

        # stream-stream join: clicks x purchases, same staged files on
        # both sides filtered by type (two full scans of the stage).
        def ij(s):
            left = s.where(F.col("event_type") == "click")
            right = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 4)
                .parquet(staged)
                .where(F.col("event_type") == "purchase")
            )
            return streaming_interval_join(
                left, right, "user_id",
                max_delay_seconds=3600, watermark_seconds=7200,
            )

        results["interval_join"] = run(spark, stream(), ij, "ij", work, counter)

        # classifier scoring over a DOCUMENT stream: the zero-shuffle
        # map-literal scorer is a stateless per-row projection, so the
        # batch function runs unchanged — this measures text-scoring
        # throughput (gram hashing dominates), not state machinery.
        from datastream_spark.operators.classifier import score_documents

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        dstaged = os.path.join(work, "docs")
        docs.repartition(n_files).write.parquet(dstaged)
        dschema = spark.read.parquet(dstaged).schema
        weights = spark.createDataFrame(
            [(b, (b * 2654435761) % 2000001 - 1000000) for b in range(1024)]
            + [(-1, 12345)],
            "b long, w_e6 long",
        )
        results["classifier_score"] = run(
            spark,
            spark.readStream.schema(dschema)
            .option("maxFilesPerTrigger", 8)
            .parquet(dstaged),
            lambda s: score_documents(s, weights, buckets=1024, portable=False),
            "clf",
            work,
            counter,
        )

        # exactly-once LSH sink under FAILURE INJECTION (SCALE §13c):
        # stream the sf documents through lsh_streaming_sink, hard-stop
        # the query mid-stream after a few committed batches, restart a
        # FRESH sink instance from the same checkpoint, and verify the
        # pairs table equals a from-scratch minhash_candidate_pairs
        # rebuild over the whole corpus — the (sink_id, batch_id)
        # marker protocol surviving a real kill, not a simulated one.
        from datastream_spark.operators.dedup import (
            minhash_candidate_pairs,
            minhash_signature_arrays,
        )
        from datastream_spark.streaming.sink import lsh_streaming_sink

        geo = dict(num_hashes=32, rows_per_band=16, shingle_k=3)
        ldocs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = ldocs.count()
        lstaged = os.path.join(work, "lsh_docs_in")
        ldocs.repartition(16).write.parquet(lstaged)
        lschema = spark.read.parquet(lstaged).schema
        bt = ManifestedTable(spark, os.path.join(work, "lsh_bands"))
        pt = ManifestedTable(spark, os.path.join(work, "lsh_pairs"))
        dt = ManifestedTable(spark, os.path.join(work, "lsh_docs"))
        ckpt = os.path.join(work, "lsh_ckpt")

        def lsh_query():
            return (
                spark.readStream.schema(lschema)
                .option("maxFilesPerTrigger", 1)
                .parquet(lstaged)
                .writeStream.foreachBatch(
                    lsh_streaming_sink(bt, pt, dt, portable_hash=False, **geo)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        t0 = time.perf_counter()
        q1 = lsh_query()
        # let a few batches commit, then kill mid-stream
        while not q1.recentProgress or int(
            q1.recentProgress[-1]["batchId"]
        ) < 4:
            if not q1.isActive:
                break
            time.sleep(0.5)
        killed_at = (
            int(q1.recentProgress[-1]["batchId"]) if q1.recentProgress else -1
        )
        q1.stop()
        q1.awaitTermination(120)
        v_mid = pt.current_version()
        q2 = lsh_query()  # fresh sink instance, same checkpoint
        q2.awaitTermination(600)
        lsh_sec = time.perf_counter() - t0

        sigs = minhash_signature_arrays(
            ldocs, "doc_id", "text",
            num_hashes=geo["num_hashes"], shingle_k=geo["shingle_k"],
            portable_hash=False,
        )
        want = minhash_candidate_pairs(
            sigs,
            id_col="doc_id",
            rows_per_band=geo["rows_per_band"],
        ).select("id_a", "id_b", "n_shared_bands")
        got = pt.read().select("id_a", "id_b", "n_shared_bands")
        mismatch = (
            got.exceptAll(want).limit(1).count()
            + want.exceptAll(got).limit(1).count()
        )
        results["lsh_sink_restart"] = {
            "sec": round(lsh_sec, 2),
            "rows": n_docs,
            "pairs": int(got.count()),
            "killed_after_batch": killed_at,
            "pairs_versions_before_restart": v_mid,
            "docs_committed": int(dt.read().count()),
            "parity_ok": mismatch == 0,
        }
        assert mismatch == 0, "restart parity violated"
        assert results["lsh_sink_restart"]["docs_committed"] == n_docs

        # the FINGERPRINT twin under the same failure injection
        # (VERDICT r8 #4): the SimHash sink shares the pairs ->
        # fingerprints -> docs commit-order design but its failure
        # window was untested at scale — kill mid-stream, restart from
        # the checkpoint, verify against a from-scratch
        # simhash_candidate_pairs rebuild (hamming included).
        from datastream_spark.operators.dedup import (
            simhash,
            simhash_candidate_pairs,
        )
        from datastream_spark.streaming.sink import simhash_streaming_sink

        sgeo = dict(bits=60, bands=4, max_hamming=3)
        sft = ManifestedTable(spark, os.path.join(work, "sh_fps"))
        spt = ManifestedTable(spark, os.path.join(work, "sh_pairs"))
        sdt = ManifestedTable(spark, os.path.join(work, "sh_docs"))
        sckpt = os.path.join(work, "sh_ckpt")

        def sh_query():
            return (
                spark.readStream.schema(lschema)
                .option("maxFilesPerTrigger", 1)
                .parquet(lstaged)
                .writeStream.foreachBatch(
                    simhash_streaming_sink(sft, spt, sdt, **sgeo)
                )
                .option("checkpointLocation", sckpt)
                .trigger(availableNow=True)
                .start()
            )

        t0 = time.perf_counter()
        s1 = sh_query()
        while not s1.recentProgress or int(
            s1.recentProgress[-1]["batchId"]
        ) < 4:
            if not s1.isActive:
                break
            time.sleep(0.5)
        sh_killed_at = (
            int(s1.recentProgress[-1]["batchId"]) if s1.recentProgress else -1
        )
        s1.stop()
        s1.awaitTermination(120)
        sv_mid = spt.current_version()
        s2 = sh_query()  # fresh sink instance, same checkpoint
        s2.awaitTermination(600)
        sh_sec = time.perf_counter() - t0

        sh_want = simhash_candidate_pairs(
            simhash(ldocs, bits=sgeo["bits"]),
            bits=sgeo["bits"], bands=sgeo["bands"],
            max_hamming=sgeo["max_hamming"],
        ).select("id_a", "id_b", "hamming")
        sh_got = spt.read().select("id_a", "id_b", "hamming")
        sh_mismatch = (
            sh_got.exceptAll(sh_want).limit(1).count()
            + sh_want.exceptAll(sh_got).limit(1).count()
        )
        results["simhash_sink_restart"] = {
            "sec": round(sh_sec, 2),
            "rows": n_docs,
            "pairs": int(sh_got.count()),
            "killed_after_batch": sh_killed_at,
            "pairs_versions_before_restart": sv_mid,
            "docs_committed": int(sdt.read().count()),
            "parity_ok": sh_mismatch == 0,
        }
        assert sh_mismatch == 0, "simhash restart parity violated"
        assert results["simhash_sink_restart"]["docs_committed"] == n_docs

        for k, v in results.items():
            v["rows_per_sec"] = int(v["rows"] / v["sec"]) if v["sec"] else 0
        print(json.dumps({"sf_dir": sf_dir, "n_rows": n_rows, **results}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
