#!/usr/bin/env python
"""Capture `.explain("formatted")` output for probes into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [probe ...]
       (e.g. `python tools/capture_plans.py r10 before q_x24_curation_funnel`)

Writes plans/<tag>/<probe>_<suffix>.txt with the formatted physical plan
of the probe's declared DataFrame at $SPARK_GRAFT_SF_DIR (default
sf0.1). Probes with driver-side protocol setup (manifest appends) run
that setup as part of building the frame — the captured plan is the
plan of the RETURNED query, exactly what the bench times end-to-end.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_spark import probes, probes_llm  # noqa: E402
from datastream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    all_q = dict(probes.QUERIES)
    all_q.update(probes_llm.QUERIES)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        try:
            df = all_q[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: wrote {path} ({len(plan)} chars)")
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
