"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The probe suite itself lives in ``datastream_spark.probes`` (each
probe implemented Spark-first with a DuckDB oracle twin); this module
is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datastream_spark import probes  # noqa: E402
from datastream_spark import probes_llm  # noqa: E402,F401  (registers X probes)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full downsampler ladder level (A1-A7, one
    hash-agg pass) over sf0.001 events."""
    return probes.QUERIES["q_a1_rollup_10s"](spark, "/root/testdata/sf0.001")


#: The driver's correctness file records the FIRST 50 queries() entries
#: per round, so dict order IS the verification rotation. Front of the
#: line: probes that have never had a driver row (added round 3) or
#: whose implementation/oracle changed this round; the tail holds
#: probes that are already green in CORRECTNESS_r02/r03 AND carry
#: redundant coverage (their construction is embedded in an in-window
#: probe, e.g. q_x2/q_x5 inside q_x2b/q_x5b, or they are rows-only by
#: design), so a round of rotation costs no unique signal.
_VERIFY_FIRST = [
    # ROUND 8 WINDOW. Arithmetic: 124 oracle + 3 rows-only probes / 50
    # driver slots. Non-negotiable: 1 brand-new probe (q_x21b), the 3
    # probes with zero-or-ancient driver rows (q_x3e has NEVER had a
    # row; q_x3c/q_m1 rows-only, last r3), 9 probes whose
    # implementation changed this round (fresh rows mandatory — the r5
    # lesson: semantic_dedup/assign_ivf_cells rewrite, CDC
    # delete-aware cores, classifier scorer path split, simhash
    # banding delegation), and the 23 r5-row probes at the documented
    # 3-round cadence ceiling. The remaining 14 slots go to r6-row
    # probes (2 rounds stale; the 33 r6-row probes that don't fit hit
    # the ceiling at ROUND 9 and must all take slots there — next
    # round's window starts from them).
    # --- brand-new in round 8: first-ever driver row
    "q_x21b_semantic_dedup_capped",  # max_cell_size chunk split (similarity.py)
    # --- zero/ancient driver rows (VERDICT r7 #3): rows-only by design
    "q_x3e_pq_topk",             # engine-local KMeans — first-ever row
    "q_x3c_ivf_topk",            # IVF recall < 1 — last row r3
    "q_m1_multimodal_pipeline",  # RNG payloads — last row r3
    # --- implementation changed in round 8: fresh rows mandatory
    "q_x21_semantic_dedup",      # assign_ivf_cells max_by argmax + checkpoint
    "q_x3g_ivf_frozen",          # same assignment rewrite (frozen centroids)
    "q_c4_incremental_ivf",      # CDC maintainer over the rewritten assignment
    "q_c3_incremental_lsh",      # delete-aware netting + tombstone core
    "q_c5_incremental_simhash",  # delete-aware netting + banding delegation
    "q_x39_quality_classifier",  # lr power-of-two gate in the trainer
    "q_x39b_classifier_score_expr",  # literal-map cap + gather-path split
    "q_x5_simhash",              # simhash_candidate_pairs -> simhash_band_rows
    "q_x5b_simhash_pairs",       # same delegation, banded-pairs shape
    # --- the 23 r5-row probes at the 3-round ceiling (VERDICT r7 #3)
    "q_s1_setops",
    "q_x9_fingerprint",
    "q_x27_tfidf",
    "q_gr3_triangles",
    "q_w9_rolling_autocorr",
    "q_x3_cosine_topk",
    "q_x3b_embedding_neardup",
    "q_x3d_embedding_quantization",
    "q_x3f_pq_adc",
    "q_g2_pivot",
    "q_g3_unpivot",
    "q_fu2_retention",
    "q_fu3_paths",
    "q_fu4_anyorder_funnel",
    "q_a11_lttb",
    "q_a13_mad_outliers",
    "q_a14_cusum",
    "q_f1_scalar",
    "q_w5_ranking_frames",
    "q_w6_distribution_windows",
    "q_j6_correlated_subquery",
    "q_j8_asof_directions",
    "q_x26_url_canonical",
    # --- 14 of the 47 r6-row probes (oldest remaining tier; includes
    #     the VERDICT-named q_a5/q_j3/q_o1/q_p1/q_st1/q_w2)
    "q_a5_rollup_route",
    "q_j3_asof",
    "q_o1_topk",
    "q_p1_range_scan",
    "q_st1_finalized_buckets",
    "q_w2_derivative",
    "q_a10_seasonal_zscore",
    "q_a16_holt",
    "q_a9_time_weighted_avg",
    "q_bt1_bradley_terry",
    "q_e4_theta_sketch",
    "q_g1_grouping_sets",
    "q_gr1_graph_stats",
    "q_gr4_bfs",
]

#: Round 8 cuts nothing below the natural dict order: _VERIFY_FIRST is
#: exactly 50 names, so everything else sits outside the window by
#: construction. The ROUND-9 obligation, recorded here so the next
#: window's arithmetic starts from it: the 33 r6-row probes left out
#: above hit the 3-round ceiling at r9 and must ALL take slots
#: (33 + any r9 implementation changes + new probes ≤ 50 fits).
_ROTATE_LAST: list[str] = []


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = dict(probes.QUERIES)
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _VERIFY_FIRST:
        ordered[name] = all_q[name]
    for name, fn in all_q.items():
        if name not in ordered and name not in _ROTATE_LAST:
            ordered[name] = fn
    for name in _ROTATE_LAST:
        ordered[name] = all_q[name]
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(probes.ORACLES)
