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
    # ROUND 10 WINDOW. Arithmetic: 125 oracle + 3 rows-only probes /
    # 50 driver slots. Non-negotiable: the 30 probes whose latest
    # driver row is r7 (the 3-round staleness ceiling lands on them
    # THIS round — VERDICT r9 #2) and 7 probes whose implementation
    # changed this round. The 13 spare slots go to the OLDEST r8-row
    # probes, prioritizing families this round touched indirectly
    # (CDC maintainers + SimHash compose the fixed spread() walk;
    # q_x39's refusal test tightened) — shrinking the r11 mandatory
    # set to 31 (the r8-tier remainder: 45 - 13 fills - q_bt1).
    # --- implementation changed in round 10: fresh rows mandatory
    "q_x10_dedup_clusters",  # connected_components: large-star/small-star distributed leg
    "q_x10b_cluster_takedown",  # delete_from_clusters: auto-rebuild + resurrection guard
    "q_st5_concurrency",  # range-partitioned prefix-sum sweep
    "q_bt1_bradley_terry",  # per-round free_local_checkpoint in _bt_joins
    "q_c3_incremental_lsh",  # composes spread(); coalesce-over-wide walk fix
    "q_c5_incremental_simhash",  # composes spread(); coalesce-over-wide walk fix
    "q_x24_curation_funnel",  # composes checkpoint_spread/spread; walk fix
    # --- the 30 r7-row probes at the 3-round ceiling (VERDICT r9 #2)
    "q_a12_ewma",
    "q_a15_decompose",
    "q_a6_custom_downsampler",
    "q_a7_histogram_percentiles",
    "q_a8_gap_fill",
    "q_dq1_expectations",
    "q_e1_approx_distinct",
    "q_e3_cms_heavy_hitters",
    "q_e5_bottomk_quantiles",
    "q_fq1_association_rules",
    "q_fu1_funnel",
    "q_gr2_pagerank",
    "q_m2_frame_sample_plan",
    "q_p2_tag_predicates",
    "q_st2_sessions",
    "q_st3_sliding_windows",
    "q_w4_counter_derivative",
    "q_w8_rolling_median",
    "q_x16_chunking",
    "q_x1_exact_dedup",
    "q_x29_split_assignment",
    "q_x30_hybrid_rrf",
    "q_x31_fuzzy_match",
    "q_x32_profile",
    "q_x33_psi_drift",
    "q_x34_score_calibration",
    "q_x35_ngram_novelty",
    "q_x37_bm25",
    "q_x40_corpus_shuffle",
    "q_z1_zorder_values",
    # --- late round-10 implementation change: the minhash rep table
    # now checkpoints (dedup.py) — q_x2b re-verifies the changed leg
    # (q_x5b, also changed, was already a fill below). Takes the slot
    # q_a5_rollup_route held; r11 mandatory set becomes 32.
    "q_x2b_minhash_lsh_pairs",
    # --- 12 oldest-r8 fills
    "q_c4_incremental_ivf",
    "q_x5_simhash",
    "q_x5b_simhash_pairs",
    "q_x39_quality_classifier",
    "q_j3_asof",
    "q_p1_range_scan",
    "q_o1_topk",
    "q_w2_derivative",
    "q_f1_scalar",
    "q_g1_grouping_sets",
    "q_s1_setops",
    "q_st1_finalized_buckets",
]

#: ROUND-11 obligation, recorded so the next window's arithmetic
#: starts from it: after this round 32 probes' latest row is r8 (the
#: 45 r8-tier minus q_bt1 and the 12 fills above — q_a5_rollup_route
#: ceded its fill slot to the q_x2b implementation change) — they hit
#: the 3-round ceiling at r11 and must ALL take slots (32 + r11
#: implementation changes + new probes <= 50 fits).
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
