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
    # ROUND 11 WINDOW. Arithmetic: 125 oracle + 3 rows-only probes /
    # 50 driver slots. Non-negotiable: the 32 probes whose latest
    # driver row is r8 (the 3-round staleness ceiling lands on them
    # THIS round — recorded as the r11 obligation in the round-10
    # window) and the 4 probes OUTSIDE that set whose implementation
    # changed this round. 14 spare slots go to the oldest r9-row
    # probes, prioritizing families round 11 examined or touched
    # indirectly (decontaminate siblings, dedup/similarity modules,
    # quality_score consumers, the flagged driver-bound q_pr1).
    # Remaining r9-tier after the fills: 27 — they hit the ceiling at
    # r12 (27 + r12 impl changes <= 50 fits).
    # --- implementation changed in round 11: fresh rows mandatory
    "q_x19_decontaminate_bloom",  # bloom membership moved into codegen (r9 tier)
    "q_x6_ngram_jaccard",  # bitmap `wide` checkpoint-then-spread (r9 tier)
    "q_x10_dedup_clusters",  # consumes the respread bitmap leg (r10 tier)
    "q_x10b_cluster_takedown",  # same (r10 tier)
    # --- the 32 r8-row probes at the 3-round ceiling (includes this
    # round's q_x3b near_dup fusion + q_x3d/q_x3f quantizer rework)
    "q_a10_seasonal_zscore",
    "q_a11_lttb",
    "q_a13_mad_outliers",
    "q_a14_cusum",
    "q_a16_holt",
    "q_a5_rollup_route",
    "q_a9_time_weighted_avg",
    "q_e4_theta_sketch",
    "q_fu2_retention",
    "q_fu3_paths",
    "q_fu4_anyorder_funnel",
    "q_g2_pivot",
    "q_g3_unpivot",
    "q_gr1_graph_stats",
    "q_gr3_triangles",
    "q_gr4_bfs",
    "q_j6_correlated_subquery",
    "q_j8_asof_directions",
    "q_m1_multimodal_pipeline",
    "q_w5_ranking_frames",
    "q_w6_distribution_windows",
    "q_w9_rolling_autocorr",
    "q_x26_url_canonical",
    "q_x27_tfidf",
    "q_x3_cosine_topk",
    "q_x3b_embedding_neardup",
    "q_x3c_ivf_topk",
    "q_x3d_embedding_quantization",
    "q_x3e_pq_topk",
    "q_x3f_pq_adc",
    "q_x3g_ivf_frozen",
    "q_x9_fingerprint",
    # --- 14 oldest-r9 fills (family-adjacent to this round's work)
    "q_x14_decontaminate",
    "q_x18_span_dedup",
    "q_x2_minhash_signatures",
    "q_x28_fuzzy_decontaminate",
    "q_x21_semantic_dedup",
    "q_x21b_semantic_dedup_capped",
    "q_x22_weighted_sample",
    "q_x8_quality",
    "q_pr1_correlation_matrix",
    "q_x20_lm_score",
    "q_x12_repetition",
    "q_x36_dsir",
    "q_c2_incremental_rollup",
    "q_m1b_netpbm_decode",
]

#: ROUND-12 obligation, recorded so the next window's arithmetic
#: starts from it: after this round 27 probes' latest row is r9 (the
#: 43 r9-tier minus q_x19/q_x6 impl-changes and the 14 fills above) —
#: they hit the 3-round ceiling at r12 and must ALL take slots
#: (27 + r12 implementation changes + new probes <= 50 fits).
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
