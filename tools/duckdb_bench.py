"""DuckDB baseline timings for BASELINE.md (SURVEY.md §6).

Runs every ``oracle_sql()`` probe on DuckDB over the same parquet
tables the Spark bench reads, times each (median of N), and prints one
JSON line mirroring bench.py's shape — the "reference" single-node
number our Spark engine is graded against (BASELINE = DuckDB on this
box, since the reference library publishes no benchmarks).

Usage: python tools/duckdb_bench.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_spark import probes, probes_llm  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    oracles = dict(probes.ORACLES)
    oracles.update(probes_llm.ORACLES)
    subset = os.environ.get("DUCKDB_QUERIES")
    if subset:
        keep = {s.strip() for s in subset.split(",")}
        oracles = {k: v for k, v in oracles.items() if k in keep}

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, sql in oracles.items():
        runs = []
        try:
            for _ in range(repeats):
                t0 = time.perf_counter()
                # fetcharrow forces full materialization without Python
                # row conversion overhead dominating the measurement.
                con.execute(sql).fetch_arrow_table()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 4)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    m = re.search(r"sf([0-9.]+)", sf_dir)
    out = {
        "metric": "duckdb_oracle_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(m.group(1).rstrip(".")) if m else -1.0,
        "repeats": repeats,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
