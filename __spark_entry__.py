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
    # ROUND 9 WINDOW. Arithmetic: 125 oracle + 3 rows-only probes / 50
    # driver slots. Non-negotiable: the 30 probes whose latest driver
    # row is r6 (the 3-round staleness ceiling lands on them THIS
    # round — VERDICT r8 #1), 1 brand-new probe (q_x10b), and 6 probes
    # whose implementation changed this round (fresh rows mandatory:
    # the semantic_dedup pay-as-needed cap gate, the classifier
    # gather-path duplicate-id refusal, the spread() coalesce fix the
    # CDC maintainers compose, and delete_from_clusters landing in
    # dedup.py next to q_x10's code path). The 13 spare slots go to
    # the OLDEST r7-row probes (CDC/decontaminate/sketch families
    # first) so the r10 mandatory set shrinks to 30.
    # --- brand-new in round 9: first-ever driver row
    "q_x10b_cluster_takedown",   # delete-aware cluster maintenance
    # --- implementation changed in round 9: fresh rows mandatory
    "q_x10_dedup_clusters",      # dedup.py cluster family (delete leg added)
    "q_x21_semantic_dedup",      # pay-as-needed max_cell_size gate
    "q_x21b_semantic_dedup_capped",  # same gate, capped path
    "q_x39b_classifier_score_expr",  # gather-path duplicate-bucket refusal
    "q_c3_incremental_lsh",      # composes spread()/checkpoint_spread
    "q_c5_incremental_simhash",  # composes spread()/checkpoint_spread
    # --- the 30 r6-row probes at the 3-round ceiling (VERDICT r8 #1)
    "q_a1_rollup_10s",
    "q_a2_cascade_minutes",
    "q_j1_stream_sum",
    "q_j2_tpch_join",
    "q_j4_semi_anti",
    "q_j7_salted_join",
    "q_j9_interval_overlap",
    "q_m1b_netpbm_decode",
    "q_pr1_correlation_matrix",
    "q_st4_native_sessions",
    "q_st5_concurrency",
    "q_w10_rolling_slope",
    "q_w7_counter_increase",
    "q_x12_repetition",
    "q_x13_source_quota",
    "q_x15_token_packing",
    "q_x17_redaction",
    "q_x18_span_dedup",
    "q_x1b_dedup_keepers",
    "q_x20_lm_score",
    "q_x22_weighted_sample",
    "q_x24_curation_funnel",
    "q_x25_mixture_plan",
    "q_x28_fuzzy_decontaminate",
    "q_x2_minhash_signatures",
    "q_x2b_minhash_lsh_pairs",
    "q_x36_dsir",
    "q_x4_text_stats",
    "q_x6_ngram_jaccard",
    "q_x7_language_id",
    # --- 13 oldest r7-row probes (keeps the r10 mandatory set at 30)
    "q_c1_table_changes",
    "q_c2_incremental_rollup",
    "q_x41_gopher_rules",
    "q_x14_decontaminate",
    "q_x19_decontaminate_bloom",
    "q_x8_quality",
    "q_x11_stratified_sample",
    "q_x23_bpe_pairs",
    "q_a3_time_downsamplers",
    "q_a4_percentiles",
    "q_e2_hll_cascade",
    "q_j5_range_join",
    "q_w3_counter_reset",
]

#: Round 9 cuts nothing below the natural dict order: _VERIFY_FIRST is
#: exactly 50 names, so everything else sits outside the window by
#: construction. The ROUND-10 obligation, recorded here so the next
#: window's arithmetic starts from it: 30 probes' latest row stays r7
#: after this round (the 44 r7-tier minus q_x10 and the 13 fills
#: above) — they hit the 3-round ceiling at r10 and must ALL take
#: slots (30 + r10 implementation changes + new probes ≤ 50 fits).
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
