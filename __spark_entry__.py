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
    # ROUND 7 WINDOW. Arithmetic: 119 oracle probes / 50 driver slots.
    # Non-negotiable slots: 7 brand-new probes (q_c3, q_c4, q_c5,
    # q_x39, q_x39b, q_x40, q_x41), 3 gates whose implementation
    # changed this round (fresh rows mandatory — the r5 lesson), and
    # the 16 probes whose last driver row is r4 (the documented
    # 3-round cadence ceiling: all 16 rotate back in now). The
    # remaining 24 slots go to r5-row probes (2 rounds stale); 23
    # r5-row probes don't fit and are cut to _ROTATE_LAST with family
    # pins — each MUST be in round 8's window (they hit the 3-round
    # ceiling there). Everything from round 6's window carries a
    # fresh r6 row and can sit out a round.
    # --- brand-new in round 7: first-ever driver rows
    "q_c3_incremental_lsh",  # CDC delta-banding (sources/cdc.py incremental_lsh_pairs)
    "q_c4_incremental_ivf",  # CDC ANN-cell maintenance (incremental_ivf_assign)
    "q_c5_incremental_simhash",  # CDC SimHash maintenance (incremental_simhash_pairs)
    "q_x39_quality_classifier",  # trained LR curation gate (operators/classifier.py)
    "q_x39b_classifier_score_expr",  # zero-shuffle map-literal scorer
    "q_x40_corpus_shuffle",  # reproducible epoch shuffle (sampling.py)
    "q_x41_gopher_rules",  # published Gopher quality-rule bundle (curation.py)
    # --- implementation changed in round 7: fresh rows mandatory
    "q_dq1_expectations",    # expect_matches \A..\z anchor (ADVICE r6)
    "q_x37_bm25",            # single-tokenize localCheckpoint rewrite
    "q_e5_bottomk_quantiles",  # guarded threshold-prefilter bottom-k
    # --- the 16 r4-row probes at the 3-round ceiling (VERDICT r6 #2)
    "q_a3_time_downsamplers",
    "q_p2_tag_predicates",
    "q_st3_sliding_windows",
    "q_x14_decontaminate",
    "q_a6_custom_downsampler",
    "q_a4_percentiles",
    "q_e1_approx_distinct",
    "q_x19_decontaminate_bloom",
    "q_j5_range_join",
    "q_x23_bpe_pairs",
    "q_x16_chunking",
    "q_x1_exact_dedup",
    "q_st2_sessions",
    "q_w3_counter_reset",
    "q_x11_stratified_sample",
    "q_m2_frame_sample_plan",
    # --- 24 of the 47 r5-row probes (oldest eligible tier; the other
    #     23 are cut to _ROTATE_LAST below: 47 - 24 = 23)
    "q_a7_histogram_percentiles",
    "q_a8_gap_fill",
    "q_a12_ewma",
    "q_a15_decompose",
    "q_c1_table_changes",
    "q_c2_incremental_rollup",
    "q_e2_hll_cascade",
    "q_e3_cms_heavy_hitters",
    "q_fq1_association_rules",
    "q_fu1_funnel",
    "q_gr2_pagerank",
    "q_w4_counter_derivative",
    "q_w8_rolling_median",
    "q_x10_dedup_clusters",
    "q_x29_split_assignment",
    "q_x30_hybrid_rrf",
    "q_x31_fuzzy_match",
    "q_x32_profile",
    "q_x33_psi_drift",
    "q_x34_score_calibration",
    "q_x35_ngram_novelty",
    "q_x3g_ivf_frozen",
    "q_x8_quality",
    "q_z1_zorder_values",
]

#: The 23 r5-row probes the round-7 window arithmetic cuts (2 rounds
#: stale now — every one MUST take a round-8 slot, where it hits the
#: documented 3-round ceiling). Each carries a family pin: a relative
#: with an r6/r7-window row exercising the same construction, plus its
#: own standing pytest pins and this round's strictdiff sweep.
_ROTATE_LAST = [
    "q_s1_setops",             # set-operation surface = engine-native
    #                             union/intersect/except-distinct rewrites
    #                             with their own pytest pins; slot ceded to
    #                             brand-new q_x41
    "q_x9_fingerprint",         # rolling-hash fingerprint pytest-pinned
    #                             (textops belt); the chunk/window-hash
    #                             family carried in-window by q_x16
    #                             chunking; slot ceded to brand-new q_x39b
    "q_x27_tfidf",              # term-weighting family carried in-window by
    #                             q_x37 BM25 (same tokenize + df/idf machinery,
    #                             fresh r7-window row) + the textops pytest
    #                             belt; slot ceded to brand-new q_c5
    "q_gr3_triangles",          # graph family in-window via q_gr2 pagerank +
    #                             r6 q_gr4 BFS row; triangle-count pytest pins;
    #                             slot ceded to brand-new q_x39
    "q_w9_rolling_autocorr",    # rolling-window family carried in-window by
    #                             q_w8 rolling median + r6 q_w10 OLS slope;
    #                             slot ceded to brand-new q_x40
    "q_x3_cosine_topk",         # brute-force cosine list embedded in in-window
    #                             q_x30 (hybrid RRF reuses cosine_topk verbatim)
    "q_x3b_embedding_neardup",  # declared gate-scale verifier (perf-weak list);
    #                             auto-cap + recall pytest pins; scale path gated
    #                             by in-window q_x3g (IVF) and r6 q_x21 (SemDeDup)
    "q_x3d_embedding_quantization",  # int8 path pinned by pytest bounds; ADC
    #                             construction gated by r5 q_x3f fixtures
    "q_x3f_pq_adc",             # frozen-codebook fixtures + pytest recall pins;
    #                             family representation via in-window q_x3g
    "q_g2_pivot",               # pivot is grouping-sets machinery: r6 q_g1 row
    #                             + registry pytest pins
    "q_g3_unpivot",             # unpivot = stack projection, same family as q_g1
    "q_fu2_retention",          # funnel family: in-window q_fu1 carries the
    #                             sequence-match construction; retention adds one
    #                             self-join, pytest-pinned
    "q_fu3_paths",              # path explode construction shared with q_fu1;
    #                             r5 row + pytest
    "q_fu4_anyorder_funnel",    # unordered funnel guards pinned by pytest
    #                             (ADVICE r5 fix); family in q_fu1
    "q_a11_lttb",               # downsample-for-plot triangle arithmetic,
    #                             pytest-pinned; anomaly/decomp family carried
    #                             in-window by q_a12/q_a15 (+ r6 q_a16/q_a10)
    "q_a13_mad_outliers",       # MAD = median machinery of in-window q_w8
    #                             rolling median + r6 q_a10 seasonal z
    "q_a14_cusum",              # one-sided CUSUM fold, same ordered-window-sum
    #                             doctrine as in-window q_a12 EWMA
    "q_f1_scalar",              # the scalar function belt is exercised by every
    #                             probe's projections; r5 row + function pytests
    "q_w5_ranking_frames",      # rank/frame family carried by in-window q_w8/q_w9
    #                             and r6 q_w10 (same Window machinery)
    "q_w6_distribution_windows",  # cume_dist/ntile family, same carrier
    "q_j6_correlated_subquery", # decorrelation gated r5; join family in-window
    #                             via q_j5 + r6 q_j9/q_j2/q_j4
    "q_j8_asof_directions",     # as-of fwd/nearest variants of r6-green q_j3
    #                             machinery (same module, direction params)
    "q_x26_url_canonical",      # scan-side regexp projection family carried
    #                             by q_x17 redaction (fresh r6 driver row) and
    #                             the textops pytest belt; slot ceded to
    #                             brand-new q_c4
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
