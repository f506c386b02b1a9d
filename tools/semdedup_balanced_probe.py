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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import os

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from datastream_spark.session import get_spark

    spark = get_spark("scale-probe")  # the engine's production config (AQE on)
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

    # untimed warmup: first execution pays codegen/JIT/GC ramp that
    # would otherwise land entirely on whichever variant runs first
    # (measured: a cold-first ordering inflates it ~6x)
    semantic_dedup(e.limit(5000), threshold=0.7).count()
    semantic_dedup(e.limit(5000), threshold=0.7, max_cell_size=None).count()

    def once(**kw):
        t0 = time.time()
        res = semantic_dedup(e, threshold=0.7, **kw).collect()
        return time.time() - t0, res

    # ALTERNATE the variants per repeat: consecutive same-variant reps
    # hand whichever runs first all the GC/page-cache ramp (measured:
    # a consecutive ordering at 100k read as a 4x "premium" that an
    # interleaved one shows is session noise)
    t_cap, t_none = [], []
    r_cap = r_none = None
    for _ in range(repeats):
        dt, r_cap = once()                      # max_cell_size=4096
        t_cap.append(dt)
        dt, r_none = once(max_cell_size=None)
        t_none.append(dt)
    out["capped_default_sec"] = round(min(t_cap), 2)
    out["uncapped_sec"] = round(min(t_none), 2)
    out["premium_pct"] = round(
        100 * (out["capped_default_sec"] / out["uncapped_sec"] - 1), 1
    )
    out["outputs_identical"] = sorted(
        (r.vec_id, r.cell_id, r.keep) for r in r_cap
    ) == sorted((r.vec_id, r.cell_id, r.keep) for r in r_none)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
