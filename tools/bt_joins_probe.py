"""Measure Bradley-Terry's JOINS path at scale (VERDICT r8 #3).

The q_bt1 probe always takes the driver path (120 pairs); the joins
path (`_bt_joins`, pairs > driver_max_pairs) was parity-pinned by
pytest and code-audited but never MEASURED under a fact-scale corpus.
This forces it (driver_max_pairs=0) on the sf10 scaledata comparisons
and splits the cost:

  - iters=1 vs iters=6: the delta is 5 pure MM rounds. If the
    per-iteration localCheckpoint re-read facts, each round would cost
    ~the fact-agg time (tens of seconds at sf10); if it reads only the
    persisted pair matrix + checkpointed items (the design), each
    round is a sub-second job over <=136 rows.
  - driver path at iters=6 for the same corpus: the baseline the
    default gate gives.

Usage: python tools/bt_joins_probe.py [sf_dir] [repeats]
Prints one JSON line; paste the numbers into SCALE.md §18.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


from pyspark.sql import functions as F


def comparisons(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber",
        (F.col("l_suppkey") % 16).alias("it"),
        F.col("l_extendedprice").alias("p"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_linenumber") - 1).alias("ln"),
        F.col("it").alias("it_b"),
        F.col("p").alias("p_b"),
    )
    return (
        li.join(
            b,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_linenumber") == F.col("ln")),
        )
        .where((F.col("p") != F.col("p_b")) & (F.col("it") != F.col("it_b")))
        .select(
            F.when(F.col("p") > F.col("p_b"), F.col("it"))
            .otherwise(F.col("it_b")).alias("winner"),
            F.when(F.col("p") > F.col("p_b"), F.col("it_b"))
            .otherwise(F.col("it")).alias("loser"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf10"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import os

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from datastream_spark.session import get_spark

    spark = get_spark("scale-probe")  # the engine's production config (AQE on)
    spark.sparkContext.setLogLevel("ERROR")
    from datastream_spark.operators.preference import bradley_terry_scores

    out: dict = {"sf_dir": sf_dir}

    def run(tag, **kw):
        best = None
        rows = None
        for _ in range(repeats):
            t0 = time.time()
            rows = bradley_terry_scores(comparisons(spark, sf_dir), **kw).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[tag] = round(best, 2)
        return rows

    r_j6 = run("joins_iters6_sec", iters=6, driver_max_pairs=0)
    run("joins_iters1_sec", iters=1, driver_max_pairs=0)
    r_d6 = run("driver_iters6_sec", iters=6)
    out["per_iter_sec"] = round(
        (out["joins_iters6_sec"] - out["joins_iters1_sec"]) / 5, 3
    )
    out["paths_agree"] = sorted(
        (r.item, r.score_e6, r.rank) for r in r_j6
    ) == sorted((r.item, r.score_e6, r.rank) for r in r_d6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
