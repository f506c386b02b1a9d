"""Fuzzy string matching / entity resolution via blocked edit-distance
joins.

The reference resolves streams by exact tag match only (api.py:~330
query_tags subset [HIGH]); a curation pipeline additionally needs
typo-tolerant record linkage (dirty names, OCR'd titles, vendor feeds
that disagree on punctuation). The classic scalable shape is
**multi-pass blocking + banded edit distance**:

- the match runs over DISTINCT normalized strings, never rows: both
  sides collapse to (string, multiplicity) first — the same
  identical-signature collapse the LSH path uses (dedup.py:201) — so
  a value that repeats 10^6 times costs one comparison, not 10^12;
- candidate pairs are generated only WITHIN a block — strings
  agreeing on a cheap key (normalized prefix / suffix + a length
  band) — so the candidate set is sum(|block_l| * |block_r|) over
  unique strings, never |L| * |R|;
- three complementary passes (prefix-k, suffix-k, and one shared
  block for strings of length <= 2k + max_dist) make single-typo
  recall exact for ``max_dist = 1`` at every length: one edit cannot
  change both the first k and the last k characters of a string
  longer than 2k, and every at-risk short pair lands in the shared
  short block. For larger distances the passes are a high-recall
  heuristic, the same trade LSH banding makes;
- the verifier is Spark's built-in ``levenshtein(l, r, threshold)``
  (JVM codegen; the threshold form runs the banded O(k*min(m,n))
  algorithm and abandons a pair the moment its distance exceeds
  ``max_dist``).

Scale posture: blocking joins shuffle on (block_key, length_band)
over unique strings; a ``max_block_rows`` cap (same design as the LSH
``max_band_freq`` cap, dedup.py:240) bounds the worst block product
deterministically. ``fuzzy_match_summary`` keeps the OUTPUT linear in
|left| too (per-row match stats, multiplicities folded by one agg);
``edit_distance_pairs`` materializes row-level pairs and therefore
inherits the data's duplication product — callers that only need
counts should use the summary. No UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def norm_key(col) -> F.Column:
    """Blocking normalization: casefold, trim, collapse whitespace."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def _distinct_string_pairs(
    l_strings: DataFrame,
    r_strings: DataFrame,
    max_dist: int,
    block_chars: int,
    len_band: int,
    max_block_rows: int | None,
) -> DataFrame:
    """(l_s, r_s, dist) over frames of DISTINCT ``_s`` strings."""
    if len_band < max_dist + 1:
        raise ValueError(
            f"len_band={len_band} must exceed max_dist={max_dist} so the "
            "length-band equi-join cannot separate a true pair"
        )
    # The prefix/suffix recall argument (one edit cannot change both
    # the first k and last k chars) only holds for strings LONGER than
    # 2k: a middle edit on a shorter string hits both blocks at once.
    # A third pass routes every string of length <= 2k + max_dist
    # (both members of any at-risk pair fall under that bound, since
    # lengths differ by <= max_dist) through one shared block — the
    # short-string set is small and the length band still splits it,
    # so the block product stays bounded and max_dist=1 recall is
    # exact at EVERY length (ADVICE r5).
    short_cut = 2 * block_chars + max_dist
    # Blocking-key / band expressions as parsed SQL strings: the three
    # passes' selects were ~1,400 blocking py4j round-trips of pure
    # plan construction (measured ~1 s steady-state on the fuzzy-match
    # probe); one selectExpr per side parses the same expressions in
    # one trip. Semantics unchanged expression-for-expression.
    passes = [
        f"substring(_s, 1, {block_chars})",
        f"substring(_s, -{block_chars}, {block_chars})",
        f"CASE WHEN length(_s) <= {short_cut} THEN ' short' END",
    ]
    cands = None
    band = f"FLOOR(length(_s) / {len_band})"
    for pk in passes:
        lb = l_strings.selectExpr(
            "_s AS l_s", f"{pk} AS _bk", f"{band} AS _lb"
        ).where("_bk IS NOT NULL")
        # |len_l - len_r| <= max_dist < len_band bounds the band delta
        # by 1 — but bands can still STRADDLE a boundary (len 19 vs 20
        # at width 4), so the right side registers under its band and
        # both neighbors to keep the join an equi-join without losing
        # a true pair.
        rb = r_strings.selectExpr(
            "_s AS r_s",
            f"{pk} AS _bk",
            f"explode(array({band} - 1, {band}, {band} + 1)) AS _lb",
        ).where("_bk IS NOT NULL")
        if max_block_rows is not None:
            # A block is hot if EITHER side exceeds the cap: the block
            # product |lb_block| * |rb_block| blows up whichever side
            # carries the bulk, so a left-only check leaves an
            # asymmetric right-heavy block uncapped. The right side is
            # counted post-explode (each string registers under 3
            # neighbor bands), which makes the right cap conservative
            # by up to 3x — acceptable, the cap is a safety valve, not
            # a tuning knob.
            def _hot(side: DataFrame) -> DataFrame:
                return (
                    side.groupBy("_bk", "_lb")
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .where(F.col("_n") > max_block_rows)
                    .select("_bk", "_lb")
                )

            hot = _hot(lb).unionByName(_hot(rb)).distinct()
            lb = lb.join(F.broadcast(hot), ["_bk", "_lb"], "left_anti")
            rb = rb.join(F.broadcast(hot), ["_bk", "_lb"], "left_anti")
        p = lb.join(rb, ["_bk", "_lb"]).select("l_s", "r_s")
        cands = p if cands is None else cands.unionByName(p)

    return (
        cands.dropDuplicates(["l_s", "r_s"])
        .selectExpr(
            "l_s", "r_s", f"levenshtein(l_s, r_s, {int(max_dist)}) AS dist"
        )
        .where("dist >= 0")
    )


def _normalized(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"), norm_key(F.col(str_col)).alias("_s")
    )


def edit_distance_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    block_chars: int = 3,
    len_band: int = 4,
    max_block_rows: int | None = None,
) -> DataFrame:
    """All (l_id, r_id, dist) pairs with edit distance <= ``max_dist``
    among block-mate candidates.

    The comparison runs in distinct-string space; ids are expanded
    back afterwards, so the OUTPUT (not the compute) is what scales
    with duplicate values — sum over matched string pairs of
    multiplicity products. Use ``fuzzy_match_summary`` when only
    per-row statistics are needed.
    """
    l, r = _normalized(left, id_col, str_col), _normalized(right, id_col, str_col)
    dp = _distinct_string_pairs(
        l.select("_s").distinct(),
        r.select("_s").distinct(),
        max_dist, block_chars, len_band, max_block_rows,
    )
    return (
        dp.join(l.select(F.col("_id").alias("l_id"), F.col("_s").alias("l_s")), "l_s")
        .join(r.select(F.col("_id").alias("r_id"), F.col("_s").alias("r_s")), "r_s")
        .select("l_id", "r_id", "dist")
    )


def fuzzy_match_summary(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    block_chars: int = 3,
    len_band: int = 4,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Per-left-row match statistics with output linear in |left|:
    (l_id, n_matches, best_dist, min_r_id). ``n_matches`` counts RIGHT
    ROWS (multiplicities folded in one agg over distinct-string
    matches); unmatched rows come back with n_matches = 0 and NULL
    best_dist/min_r_id — the lossless left-join discipline
    (anomaly.py seasonal scoring, ADVICE r4)."""
    l, r = _normalized(left, id_col, str_col), _normalized(right, id_col, str_col)
    rd = r.groupBy("_s").agg(
        F.count(F.lit(1)).alias("r_n"), F.min("_id").alias("r_min_id")
    )
    dp = _distinct_string_pairs(
        l.select("_s").distinct(),
        rd.select("_s"),
        max_dist, block_chars, len_band, max_block_rows,
    )
    per_ls = (
        dp.join(rd.select(F.col("_s").alias("r_s"), "r_n", "r_min_id"), "r_s")
        .groupBy("l_s")
        .agg(
            F.sum("r_n").alias("n_matches"),
            F.min("dist").alias("best_dist"),
            F.min("r_min_id").alias("min_r_id"),
        )
    )
    return (
        l.join(per_ls.withColumnRenamed("l_s", "_s"), "_s", "left")
        .select(
            F.col("_id").alias("l_id"),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            "best_dist",
            "min_r_id",
        )
    )


def self_match_pairs(
    df: DataFrame, id_col: str, str_col: str, max_dist: int = 1, **kw
) -> DataFrame:
    """Within-table near-duplicate records: canonical (l_id < r_id)
    pairs, self-pairs excluded — feeds the same union-find clustering
    as the text dedup families (dedup.py cluster_pairs)."""
    pairs = edit_distance_pairs(df, df, id_col, str_col, max_dist=max_dist, **kw)
    return pairs.where(F.col("l_id") < F.col("r_id"))
