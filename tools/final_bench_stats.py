#!/usr/bin/env python
"""Summarise the end-of-round bench: suite cold/min, oracle-subset and
floor/substantive buckets (per BASELINE.md methodology), and the
largest per-probe deltas vs the pre-optimization baseline.

Usage: python tools/final_bench_stats.py RUN1.json RUN2.json
"""
import json
import sys

REPO = "/root/repo"

ROWS_ONLY = {"q_m1_image_decode", "q_x3c_ivf_recall", "q_x3e_pq_topk"}


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    r1, r2 = load(sys.argv[1]), load(sys.argv[2])
    base = load(f"{REPO}/BENCH_baseline_r10opt.json")
    duck = json.load(open(f"{REPO}/BASELINE_duckdb_sf0.1.json"))

    q1, q2, qb, qd = r1["queries"], r2["queries"], base["queries"], duck["queries"]
    names = sorted(q1)
    assert set(q1) == set(q2) == set(qb), "query set drift"

    qmin = {n: min(q1[n], q2[n]) for n in names}
    oracle = [n for n in names if n not in ROWS_ONLY and n in qd]
    subst = [n for n in oracle if qd[n] >= 0.1]
    floor = [n for n in oracle if qd[n] < 0.1]

    def tot(qs, sub):
        return sum(qs[n] for n in sub)

    print(f"suite cold (run1):        {r1['value']:8.1f} s   baseline {base['value']:.1f} s")
    print(f"suite run2:               {r2['value']:8.1f} s")
    print(f"suite min-of-2:           {tot(qmin, names):8.1f} s")
    print(f"oracle subset cold:       {tot(q1, oracle):8.1f} s   duckdb min {tot(qd, oracle):.1f} s  (n={len(oracle)})")
    print(f"oracle subset min:        {tot(qmin, oracle):8.1f} s")
    print(f"substantive cold (n={len(subst)}): {tot(q1, subst):8.1f} s   duckdb {tot(qd, subst):.1f} s")
    print(f"substantive min:          {tot(qmin, subst):8.1f} s")
    print(f"floor cold (n={len(floor)}):       {tot(q1, floor):8.1f} s   duckdb {tot(qd, floor):.1f} s")

    print("\nlargest improvements vs pre-opt baseline (cold, >0.2 s):")
    deltas = sorted(names, key=lambda n: q1[n] - qb[n])
    for n in deltas:
        d = q1[n] - qb[n]
        if d <= -0.2:
            print(f"  {n:34s} {qb[n]:7.2f} -> {q1[n]:7.2f}  ({d:+.2f})")
    print("\nlargest regressions vs pre-opt baseline (cold, >0.2 s):")
    for n in reversed(deltas):
        d = q1[n] - qb[n]
        if d >= 0.2:
            print(f"  {n:34s} {qb[n]:7.2f} -> {q1[n]:7.2f}  ({d:+.2f})  min-of-2 {qmin[n]:.2f}")


if __name__ == "__main__":
    main()
