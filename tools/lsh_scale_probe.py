"""Measure the PRODUCTION MinHash-LSH near-dup path at scale.

The oracle probe (q_x2b) deliberately pays the DuckDB-replayable md5
signature family over a bounded doc slice so its output stays
hash-checkable; its timings therefore say nothing about the real
dedup path. This tool times what a 100 TB run would actually execute:
xxhash64 shingle hashing (one zero-shuffle projection to array-form
signatures), identical-signature collapse, banded candidate
generation with the deterministic band-frequency cap, and Jaccard
refinement — end-to-end over the FULL documents table at the given
scale, forced with a noop write like bench.py.

Usage: python tools/lsh_scale_probe.py SF_DIR [min_jaccard]
Prints one JSON line: rows in, distinct signatures, pairs out, secs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_spark.session import get_spark  # noqa: E402
from datastream_spark.operators.dedup import (  # noqa: E402
    minhash_near_dup_pairs,
    minhash_signature_arrays,
)


def main() -> None:
    sf_dir = sys.argv[1]
    min_j = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("lsh-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()  # warms the scan; excluded from the timing

    t0 = time.monotonic()
    sigs = minhash_signature_arrays(docs, portable_hash=False)
    pairs = minhash_near_dup_pairs(sigs, min_jaccard=min_j)
    n_pairs = pairs.count()
    secs = time.monotonic() - t0

    print(
        json.dumps(
            {
                "metric": "lsh_production_near_dup",
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "min_jaccard": min_j,
                "n_pairs": n_pairs,
                "value": round(secs, 4),
                "unit": "sec",
            }
        )
    )


def family_compare() -> None:
    """Time the portable-md5 (oracle-replay) family against the
    production xxhash64 family on the SAME corpus and geometry — the
    q_x2b cost-split row (VERDICT r5 item 8): the oracle probe's cost
    is dominated by the portable family's md5-hex arithmetic, which
    the product never runs. Usage:
    python tools/lsh_scale_probe.py --family SF_DIR [min_jaccard]
    """
    sf_dir = sys.argv[2]
    min_j = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    spark = get_spark("lsh-family-compare")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    out = {"metric": "lsh_family_cost_split", "sf_dir": sf_dir,
           "n_docs": n_docs, "min_jaccard": min_j}
    # untimed warm pass on a slice: both families' generated code
    # compiles before either is timed, so run order doesn't bias the
    # split (the bench.py warm-pass rationale)
    warm = docs.limit(2000)
    for portable in (False, True):
        minhash_near_dup_pairs(
            minhash_signature_arrays(warm, portable_hash=portable),
            min_jaccard=min_j,
        ).count()
    for fam, portable in (("xxhash64", False), ("portable_md5", True)):
        t0 = time.monotonic()
        sigs = minhash_signature_arrays(docs, portable_hash=portable)
        pairs = minhash_near_dup_pairs(sigs, min_jaccard=min_j)
        out[f"{fam}_pairs"] = pairs.count()
        out[f"{fam}_sec"] = round(time.monotonic() - t0, 2)
    out["md5_over_xxhash"] = round(
        out["portable_md5_sec"] / out["xxhash64_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    if "--family" in sys.argv:
        family_compare()
    else:
        main()
