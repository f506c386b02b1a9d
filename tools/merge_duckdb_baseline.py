"""Merge DuckDB baseline runs into an element-wise-min artifact.

Usage:
    python tools/merge_duckdb_baseline.py OUT.json RUN1.json RUN2.json ... \
        [--old OLD.json --old-commit SHA]

Methodology (BASELINE.md): the recorded DuckDB number is the
element-wise (per-probe) min across quiet-machine runs of
``tools/duckdb_bench.py`` — run them SERIALLY with nothing else on the
box; concurrent Spark load inflates DuckDB ~60% and taints the run.
A prior artifact's values may join the min, but ONLY for probes whose
oracle SQL is byte-identical between its commit and HEAD: timing a
different query is not a rerun of the same one. Oracle equality is
checked by importing the probes package from both git trees.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


def oracles_at(ref: str) -> dict[str, str]:
    """ORACLES dict from the probes modules as of a git ref."""
    d = tempfile.mkdtemp()
    files = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "ls-tree", "-r", "--name-only", ref, "datastream_spark"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in files:
        if not f.endswith(".py"):
            continue
        dst = os.path.join(d, f)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        blob = subprocess.run(
            ["git", "-C", repo, "show", f"{ref}:{f}"],
            capture_output=True, text=True, check=True,
        ).stdout
        open(dst, "w").write(blob)
    sys.path.insert(0, d)
    for m in [k for k in list(sys.modules) if k.startswith("datastream_spark")]:
        del sys.modules[m]
    import datastream_spark.probes as p  # noqa: PLC0415
    import datastream_spark.probes_llm  # noqa: F401,PLC0415  (registers oracles)

    out = dict(p.ORACLES)
    sys.path.pop(0)
    for m in [k for k in list(sys.modules) if k.startswith("datastream_spark")]:
        del sys.modules[m]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--old", help="prior artifact to merge where oracles unchanged")
    ap.add_argument("--old-commit", help="git ref the prior artifact was built at")
    a = ap.parse_args()

    runs = [json.load(open(p)) for p in a.runs]
    keys = list(runs[0]["queries"])
    if not all(set(r["queries"]) == set(keys) for r in runs):
        raise SystemExit("run probe sets differ — regenerate on the same HEAD")

    unchanged: set[str] = set()
    old = None
    if a.old:
        if not a.old_commit:
            raise SystemExit("--old requires --old-commit")
        old = json.load(open(a.old))
        old_oracles = oracles_at(a.old_commit)
        new_oracles = oracles_at("HEAD")
        unchanged = {
            k for k in keys
            if k in old["queries"] and old_oracles.get(k) is not None
            and old_oracles.get(k) == new_oracles.get(k)
        }

    merged = {}
    for k in keys:
        vals = [r["queries"][k] for r in runs]
        if k in unchanged:
            vals.append(old["queries"][k])
        merged[k] = round(min(vals), 4)

    note = (
        f"element-wise min across {len(runs)} quiet-machine same-data runs "
        "x median-of-3 each"
    )
    if unchanged:
        note += (
            f", plus the prior artifact's mins for the {len(unchanged)} probes "
            f"whose oracle SQL is unchanged since {a.old_commit}"
        )
    out = {
        "metric": "duckdb_oracle_wall_clock",
        "value": round(sum(merged.values()), 4),
        "unit": "sec",
        "sf": runs[0].get("sf", 0.1),
        "repeats": runs[0].get("repeats", 3),
        "runs": len(runs),
        "note": note,
        "queries": merged,
    }
    json.dump(out, open(a.out, "w"))
    print("total:", out["value"], "probes:", len(merged),
          "old-merged:", len(unchanged))


if __name__ == "__main__":
    main()
