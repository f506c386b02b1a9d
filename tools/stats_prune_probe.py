"""Manifest footer-stats pruning at scale (SCALE.md §23).

Round 10 added per-file column min/max stats to every manifest commit
(parquet footer metadata only — the manifest-level half of predicate
pushdown, same core as Delta data-skipping / Iceberg metrics pruning).
This probe measures what that buys on a time-clustered table:

1. build a ManifestedTable from the sf events table, appended as N
   time-ordered commits (the natural shape of a streaming/batch
   ingest — files are time-clustered without any explicit sort),
2. time a narrow time-range aggregate via the FULL scan
   (``read()`` + ``.where``; Spark still row-group-prunes inside
   each file, so this is the strongest possible baseline) vs the
   pruned scan (``read(where=...)``),
3. time a range takedown via unpruned ``delete_where`` (detection
   pass opens every file) vs ``delete_where(prune=...)``,
4. verify both reads return identical counts and both takedown paths
   delete the same rows.

Usage: python tools/stats_prune_probe.py [sf_dir] [n_commits]
Prints one JSON line with file counts, candidate counts, and seconds
per path.
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
from datastream_spark.sources.manifest import ManifestedTable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf10"
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_col = "ts" if "ts" in ev.columns else ev.columns[0]
    lo, hi = ev.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    step = (hi - lo) / n_commits  # int or timedelta, both divide

    root = tempfile.mkdtemp(prefix="stats_probe_")
    out: dict = {"sf_dir": sf_dir, "n_commits": n_commits}
    try:
        t = ManifestedTable(spark, os.path.join(root, "events"))
        t0 = time.time()
        for k in range(n_commits):
            a = lo + k * step
            cond = F.col(ts_col) >= a
            if k < n_commits - 1:
                cond = cond & (F.col(ts_col) < (lo + (k + 1) * step))
            t.append(ev.where(cond).coalesce(1))
        out["build_s"] = round(time.time() - t0, 1)
        out["n_files"] = len(t.current_files())

        # a ~1/n_commits-wide range in the middle of the time span
        mid = n_commits // 2
        ra, rb = lo + mid * step, lo + (mid + 1) * step
        rng = [(ts_col, ">=", ra), (ts_col, "<", rb)]
        out["n_candidates"] = len(t.files_where(rng))

        def timed(df):
            s = time.time()
            n = df.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
            return n, round(time.time() - s, 2)

        full = t.read().where(
            (F.col(ts_col) >= ra) & (F.col(ts_col) < rb)
        )
        n_full, s_full = timed(full)
        n_pruned, s_pruned = timed(t.read(where=rng))
        assert n_full == n_pruned, (n_full, n_pruned)
        out["range_rows"] = n_full
        out["full_scan_s"] = s_full
        out["pruned_scan_s"] = s_pruned

        # takedown of one narrow time slice, both paths on identical
        # clones of the manifest log (same data files, so clone cost
        # is the manifest json only)
        da = lo + (n_commits * 5 // 8) * step
        db = da + step / 50
        cond = (F.col(ts_col) >= da) & (F.col(ts_col) < db)
        clone = ManifestedTable(spark, os.path.join(root, "events2"))
        shutil.rmtree(clone.commits_dir)
        shutil.copytree(t.commits_dir, clone.commits_dir)

        s = time.time()
        t.delete_where(cond)
        out["takedown_unpruned_s"] = round(time.time() - s, 2)
        s = time.time()
        clone.delete_where(
            cond, prune=[(ts_col, ">=", da), (ts_col, "<", db)]
        )
        out["takedown_pruned_s"] = round(time.time() - s, 2)
        n_a, n_b = t.read().count(), clone.read().count()
        assert n_a == n_b, (n_a, n_b)
        out["post_takedown_rows"] = n_a

        # optimize: cluster on a key the WRITE order never clustered
        # (user_id) — before, a user-range predicate opens every file;
        # after one sort_by rewrite, it opens its file neighborhood
        if "user_id" in ev.columns:
            u_lo, u_hi = t.read().agg(
                F.min("user_id"), F.max("user_id")
            ).collect()[0]
            span = (int(u_hi) - int(u_lo)) // n_commits + 1
            urng = [
                ("user_id", ">=", int(u_lo) + span),
                ("user_id", "<", int(u_lo) + 2 * span),
            ]
            out["user_candidates_pre"] = len(t.files_where(urng))
            n_u_pre, s_u_pre = timed(t.read(where=urng))
            s = time.time()
            t.optimize(sort_by=["user_id"], target_file_bytes=16 << 20)
            out["optimize_s"] = round(time.time() - s, 1)
            out["n_files_post_opt"] = len(t.current_files())
            out["user_candidates_post"] = len(t.files_where(urng))
            n_u_post, s_u_post = timed(t.read(where=urng))
            assert n_u_pre == n_u_post, (n_u_pre, n_u_post)
            out["user_range_rows"] = n_u_pre
            out["user_scan_pre_s"] = s_u_pre
            out["user_scan_post_s"] = s_u_post
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
