"""Measure the SemDeDup cap premium on a BALANCED corpus (VERDICT r8 #5).

Round 8 measured the `max_cell_size` machinery at ~25% overhead on a
balanced synthetic 100k corpus (25.3 s vs 17.2 s) — the premium that
buys the bounded worst case. Round 9 makes it pay-as-needed: one
count-agg over the already-checkpointed assignment skips the
pivot-join + two windows when no cell exceeds the cap. This probe
verifies the balanced case now lands within ~5% of
``max_cell_size=None`` while the skew case (separate: SCALE §21's
30k-clique scenario) still trips the split.

Usage: python tools/semdedup_balanced_probe.py [n_rows] [repeats]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import SparkSession


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datastream_spark.operators.similarity import semantic_dedup

    # balanced: isotropic gaussian, 64-dim — cells come out near-even
    rng = np.random.RandomState(42)
    vecs = rng.randn(n, 64).astype(np.float64)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32).localCheckpoint(eager=True)

    out: dict = {"n_rows": n}

    def run(tag, **kw):
        best = None
        res = None
        for _ in range(repeats):
            t0 = time.time()
            res = semantic_dedup(e, threshold=0.7, **kw).collect()
            best = min(best or 1e9, time.time() - t0)
        out[tag] = round(best, 2)
        return res

    r_cap = run("capped_default_sec")           # max_cell_size=4096
    r_none = run("uncapped_sec", max_cell_size=None)
    out["premium_pct"] = round(
        100 * (out["capped_default_sec"] / out["uncapped_sec"] - 1), 1
    )
    out["outputs_identical"] = sorted(
        (r.vec_id, r.cell_id, r.keep) for r in r_cap
    ) == sorted((r.vec_id, r.cell_id, r.keep) for r in r_none)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
