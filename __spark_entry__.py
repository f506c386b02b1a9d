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
    # --- the 24 probes rotated OUT of round 4's window: front of the
    # line so union(CORRECTNESS_r04, CORRECTNESS_r05) covers every
    # probe with a fresh driver row (VERDICT r4 item 4)
    "q_x10_dedup_clusters",
    "q_x3_cosine_topk",
    "q_x3d_embedding_quantization",
    # q_x4_text_stats / q_x7_language_id rotate out: three-round-green
    # pure projections re-verified via strictdiff this session; their
    # expression families are exercised in-window by q_x8 (quality
    # composes the same token/punct/stopword stats).
    "q_x8_quality",
    "q_x9_fingerprint",
    # q_x2_minhash_signatures / q_x5_simhash / q_x1b_dedup_keepers
    # also rotate out: their constructions are embedded in q_x2b /
    # q_x5b / q_x24 (all r4-green driver hash rows) and each
    # re-passed strictdiff this session.
    "q_x3b_embedding_neardup",
    "q_j2_tpch_join",
    # q_j4_semi_anti / q_o1_topk rotate out (both unchanged since r1,
    # green in this session's full 104/104 compare sweep): q_j4's
    # semi/anti rewrite is pinned in-window by q_j6, whose correlated
    # subquery decorrelates to the same left-semi plan, and q_o1's
    # rank-limit construct by q_x3's top-k window. Their slots go to
    # q_w4/q_a5, whose GATES changed this round (exact centi-unit
    # counter; exact integer moments) and therefore need fresh driver
    # rows — the r4 rows describe the old oracle SQL.
    "q_w4_counter_derivative",
    "q_a5_rollup_route",
    "q_j6_correlated_subquery",
    "q_s1_setops",
    "q_f1_scalar",
    "q_g2_pivot",
    "q_g3_unpivot",
    "q_w5_ranking_frames",
    "q_w6_distribution_windows",
    # q_m1 / q_x3c / q_x3e rotate out: rows-only BY DESIGN (RNG
    # payloads / recall<1 / live KMeans), so a driver row carries no
    # hash signal — their correctness evidence is the pytest
    # recall/contract suite plus the hash-gated twins q_m1b / q_x3g /
    # q_x3f that ARE windowed or r4-green.
    # --- new or implementation/oracle-changed in round 5
    "q_a11_lttb",                # NEW: LTTB visualization downsampling
    "q_a12_ewma",                # NEW: EWMA smoothing (floor-scaled gate)
    "q_a13_mad_outliers",        # NEW: MAD robust outlier scoring
    "q_x27_tfidf",               # NEW: TF-IDF keyword extraction
    "q_gr2_pagerank",            # NEW: fixed-iteration PageRank
    "q_w8_rolling_median",       # NEW: rolling exact quantiles
    "q_a14_cusum",               # NEW: CUSUM change-point scores
    "q_e2_hll_cascade",          # NEW: mergeable HLL distinct ladder
    "q_x28_fuzzy_decontaminate",  # NEW: MinHash-LSH bipartite decon
    "q_e3_cms_heavy_hitters",    # NEW: count-min sketch heavy hitters
    "q_x29_split_assignment",    # NEW: deterministic train/val/test splits
    "q_x30_hybrid_rrf",          # NEW: hybrid retrieval via RRF fusion
    "q_z1_zorder_values",        # NEW: Z-order layout Morton values
    "q_fu1_funnel",              # NEW: ordered conversion funnel
    "q_fu2_retention",           # NEW: cohort retention
    "q_fu3_paths",               # NEW: user journey paths
    "q_x3g_ivf_frozen",          # NEW: IVF hash gate on frozen centroids
    "q_x3f_pq_adc",              # NEW: hash-gated PQ on frozen codebooks
    "q_c1_table_changes",        # NEW: CDC snapshot-diff feed
    "q_c2_incremental_rollup",   # NEW: incremental view maintenance
    "q_x31_fuzzy_match",         # NEW: blocked edit-distance ER
    "q_gr3_triangles",           # NEW: degree-oriented triangle counts
    "q_a15_decompose",           # NEW: seasonal-trend decomposition
    "q_fq1_association_rules",   # NEW: pair support/confidence/lift
    "q_w9_rolling_autocorr",     # NEW: rolling lag-1 correlation
    "q_x32_profile",             # NEW: one-pass column profiling
    "q_x33_psi_drift",           # NEW: PSI distribution drift
    "q_x34_score_calibration",   # NEW: cross-source calibration
    "q_fu4_anyorder_funnel",     # NEW: set-completion funnel
    "q_x35_ngram_novelty",       # NEW: reference-corpus novelty
    "q_x26_url_canonical",       # tracking-param strip rewritten
    "q_a8_gap_fill",             # O(n) window frames + bound snapping
    "q_j8_asof_directions",      # forward frame now reversed-running
    "q_a7_histogram_percentiles",  # quantile label derivation changed
    # q_j3_asof rotates out: the round-5 as-of fix touched only the
    # FORWARD frame (q_j8's surface); the backward path its green r4
    # driver row pins is byte-identical this round, re-verified via
    # strictdiff this session. (q_w4 re-entered the window above when
    # its gate moved to exact centi-units.)
]

#: r4-green probes whose construction is embedded in an in-window
#: probe (x2b/x5b/x24 embed x2/x5/x1b... now themselves in-window) or
#: that carry the freshest driver rows — a round out of the window
#: costs no unique signal.
_ROTATE_LAST = [
    "q_x12_repetition",
    "q_x15_token_packing",
    "q_x18_span_dedup",
    "q_x19_decontaminate_bloom",
    "q_x20_lm_score",
    "q_x21_semantic_dedup",
    "q_x22_weighted_sample",
    "q_x23_bpe_pairs",
    "q_x24_curation_funnel",
    "q_m2_frame_sample_plan",
    "q_x11_stratified_sample",
    "q_x13_source_quota",
    "q_x14_decontaminate",
    "q_x16_chunking",
    "q_x17_redaction",
    "q_m1b_netpbm_decode",
    "q_x2b_minhash_lsh_pairs",
    "q_x5b_simhash_pairs",
    "q_e1_approx_distinct",
    "q_x25_mixture_plan",
    "q_a9_time_weighted_avg",
    "q_w7_counter_increase",
    "q_a10_seasonal_zscore",
    "q_x1_exact_dedup",
    "q_x6_ngram_jaccard",
    "q_st4_native_sessions",  # construct pinned by q_st2's oracle
    "q_j7_salted_join",       # multiset-equality pinned by pytest
    "q_gr1_graph_stats",      # construction-replay oracle, 3x r-green
    "q_j5_range_join",        # bin-rewrite pinned by plan audit + sf1
    "q_a4_percentiles",       # percentile==quantile_cont re-pinned by q_a13
    "q_a6_custom_downsampler",  # registry decomposability pinned by q_a7
    "q_a3_time_downsamplers",   # ladder-column family pinned by q_a1/a2
    "q_st3_sliding_windows",    # native-window ≡ unnest pinned 3 rounds
    "q_p2_tag_predicates",      # scan-pruning pinned by plan audit
    "q_w3_counter_reset",       # composed inside in-window q_w4
    "q_g1_grouping_sets",       # pivot/unpivot relatives in-window
]


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
