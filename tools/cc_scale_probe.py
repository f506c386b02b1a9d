"""Connected-components strategy shoot-out at scale (SCALE.md §23).

Round 9 measured the old distributed leg (min-label propagation,
rounds = graph diameter) DNF (>50 min) on the sf10 near-dup pair
graph, while the driver union-find path finished in 103 s — leaving
NO working path once a pair graph outgrows driver memory. Round 10
replaced that leg with alternating large-star/small-star (Kiveris et
al., SoCC 2014; O(log n) rounds independent of diameter). This probe
re-runs the exact round-9 scenario:

1. mine the sf10 minhash pair graph (untimed setup, same GEO as
   tools/takedown_scale_probe.py: num_hashes=32, rows_per_band=16),
2. time ``connected_components`` on the driver union-find path,
3. time it again with ``driver_threshold=0`` (the new distributed
   leg),
4. assert the two outputs are set-equal (parity at scale, not just in
   the pytest twin).

Usage: python tools/cc_scale_probe.py [sf_dir]
Prints one JSON line with edge count, per-strategy seconds, round
count observations, and the parity verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datastream_spark.operators.dedup import (  # noqa: E402
    connected_components,
    minhash_candidate_pairs,
    minhash_signature_arrays,
)
from datastream_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf10"
    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signature_arrays(
        docs, num_hashes=32, shingle_k=3, portable_hash=False
    )
    pairs = (
        minhash_candidate_pairs(sigs, rows_per_band=16)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)  # untimed amortized setup
    )
    out["n_edges"] = pairs.count()

    t0 = time.time()
    drv = connected_components(pairs, driver_threshold=1 << 62)
    out["driver_rows"] = drv.count()
    out["driver_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    dist = connected_components(pairs, driver_threshold=0)
    out["dist_rows"] = dist.count()
    out["dist_sec"] = round(time.time() - t0, 1)

    out["parity"] = (
        drv.exceptAll(dist).isEmpty() and dist.exceptAll(drv).isEmpty()
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
