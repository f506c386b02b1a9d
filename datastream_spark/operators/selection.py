"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023).

The published construction ("Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): featurize every document as a
bag of hashed n-grams, fit bag-of-buckets models on a small TARGET
corpus (the distribution you want more of) and on the RAW pool,
weight each raw document by its log-likelihood ratio under the two
models, and resample the pool with Gumbel-top-k — the standard
trick that turns weighted sampling-without-replacement into a
deterministic rank over perturbed scores.

This is the canonical "make 100 TB of crawl look like Wikipedia"
pre-training selection step, and it composes with the rest of the
curation surface (SURVEY.md §2.10 X-family): quality filters remove
junk, dedup removes repeats, DSIR then *shapes* what remains.

Execution shape (all built-in functions, no Python in the hot path):

- featurize: explode hashed n-gram buckets — one narrow projection
  per corpus, two-phase hash aggregation to (doc, bucket, cnt);
- models: the bucket tables aggregate to ≤ ``buckets`` rows each —
  broadcast-sized by construction regardless of corpus size;
- weights: ONE broadcast join of doc-bucket counts against the
  λ-table plus a partial-aggregated rollup to one row per doc. The
  only fact-sized shuffles are the two (doc, bucket) aggregations.

Cross-engine float doctrine (tools/float_divergence.py): the
λ-table quantizes ``log(p_target/p_raw)`` to integer micro-units
(floor(λ·1e6) BIGINT) at the BUCKET level — a few thousand floors of
libm-identical doubles — and every per-DOCUMENT weight is then an
exact BIGINT dot product (Σ cnt·λ_e6), immune to sum-associativity
divergence, so selection ranks replay bit-for-bit in the DuckDB
oracle. Gumbel noise uses the portable md5 hash as its uniform
source, so the "random" resample is itself deterministic and
cross-engine replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import md5_bucket, spread, ws_tokens

__all__ = [
    "hashed_gram_buckets",
    "dsir_lambda_table",
    "dsir_weights",
    "dsir_select",
]

#: Hash domain of md5_bucket / xxhash64>>4 — shared with kmv.py.
HASH_SPACE = float(1 << 60)


def _gram_bucket(gram: Column, buckets: int, portable: bool) -> Column:
    if portable:
        return F.pmod(md5_bucket(gram), F.lit(buckets))
    return F.pmod(F.xxhash64(gram), F.lit(buckets))


def hashed_gram_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 2048,
    portable: bool = True,
) -> DataFrame:
    """(id, b, cnt): hashed unigram+bigram bucket counts per document.

    The DSIR featurizer — whitespace tokens of normalized text, the
    token stream plus its bigrams, each hashed into ``buckets``
    buckets. Explode + one two-phase hash aggregation.
    """
    base = spread(
        df.select(F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks"))
    )
    bigrams = F.transform(
        F.slice(
            F.col("_toks"), 1, F.greatest(F.size("_toks") - 1, F.lit(0))
        ),
        lambda t, i: F.concat_ws(" ", t, F.col("_toks")[i + 1]),
    )
    grams = base.select(
        "_id", F.explode(F.concat(F.col("_toks"), bigrams)).alias("gram")
    )
    return (
        grams.select("_id", _gram_bucket(F.col("gram"), buckets, portable).alias("b"))
        .groupBy("_id", "b")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_lambda_table(
    raw_buckets: DataFrame,
    target_buckets: DataFrame,
    *,
    buckets: int = 2048,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-bucket quantized log-likelihood ratio λ_e6 BIGINT:

        λ(b) = ln((ct_b + s) / (Nt + s·B)) − ln((cr_b + s) / (Nr + s·B))

    floor-quantized to micro-units; buckets absent from one side get
    its smoothed floor probability. Output is ≤ B rows — the
    broadcast side of the weight join.

    Alignment is union+regroup (the profile.py trick), not an outer
    join: a FULL OUTER can neither broadcast nor hash in Spark, so
    even two ≤ B-row models would drag in a SortMergeJoin. The union
    collapses in one two-phase aggregation; the 1-row totals attach
    via a bounded broadcast NLJ.
    """
    t = target_buckets.groupBy("b").agg(F.sum("cnt").alias("ct"))
    r = raw_buckets.groupBy("b").agg(F.sum("cnt").alias("cr"))
    u = (
        t.select("b", "ct", F.lit(0).cast("long").alias("cr"))
        .unionByName(r.select("b", F.lit(0).cast("long").alias("ct"), "cr"))
        .groupBy("b")
        .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr"))
    )
    total = u.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    sb = float(smoothing) * buckets
    lam = F.log(
        (F.col("ct").cast("double") + F.lit(float(smoothing)))
        / (F.col("nt").cast("double") + F.lit(sb))
    ) - F.log(
        (F.col("cr").cast("double") + F.lit(float(smoothing)))
        / (F.col("nr").cast("double") + F.lit(sb))
    )
    return u.crossJoin(F.broadcast(total)).select(
        "b", F.floor(lam * F.lit(1_000_000.0)).cast("bigint").alias("lam_e6")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 2048,
    smoothing: float = 1.0,
    portable: bool = True,
    raw_features: DataFrame | None = None,
    target_features: DataFrame | None = None,
) -> DataFrame:
    """Importance weight per raw document: (id, n_grams, weight_e6).

    ``weight_e6 = Σ_b cnt_{d,b} · λ_e6(b)`` — the document's
    log-likelihood ratio in exact integer micro-units.

    The raw feature frame is consumed twice (the raw bucket model and
    the weight join). By default both consumers derive it lazily —
    two narrow tokenize+hash passes over the text, nothing pinned in
    the session cache. At 100 TB, materialize
    ``hashed_gram_buckets(raw)`` once (write to parquet, or persist
    if it fits) and pass it as ``raw_features`` so the corpus is
    tokenized exactly once. When the target is a SLICE of the raw
    corpus (the common DSIR deployment), also pass
    ``target_features`` derived from that same materialized frame
    (``raw_features.join(target_ids, "_id", "left_semi")``) — the
    bucket counts are identical to re-featurizing the slice (same
    docs, same text, same hash family), and the slice's
    tokenize+hash pass disappears entirely."""
    raw_b = raw_features
    if raw_b is None:
        raw_b = hashed_gram_buckets(
            raw, id_col=id_col, text_col=text_col, buckets=buckets, portable=portable
        )
    tgt_b = target_features
    if tgt_b is None:
        tgt_b = hashed_gram_buckets(
            target, id_col=id_col, text_col=text_col, buckets=buckets,
            portable=portable,
        )
    lam = dsir_lambda_table(raw_b, tgt_b, buckets=buckets, smoothing=smoothing)
    return (
        raw_b.join(F.broadcast(lam), "b")
        .groupBy("_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lam_e6")).alias("weight_e6"),
        )
        .select(F.col("_id").alias(id_col), "n_grams", "weight_e6")
    )


def dsir_select(
    weights: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    temperature: float = 0.0,
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k resample: keep the ``k`` documents with the
    largest ``weight_e6 + τ·G_d`` where ``G_d = −ln(−ln(u_d))`` and
    ``u_d`` is a deterministic uniform drawn from the portable hash of
    ``(id, seed)`` — reproducible across runs AND engines, which is
    what lets the oracle replay a *sampling* operator exactly.
    ``temperature=0`` degenerates to plain top-k (the argmax limit).

    Output: (rank, id, n_grams, weight_e6, score_e6); total order
    pinned by (score_e6 DESC, id). TakeOrdered-style: the rank filter
    is a WindowGroupLimit candidate, map tasks emit ≤ k rows each.
    """
    if temperature <= 0.0:
        score = F.col("weight_e6")
    else:
        u = (
            md5_bucket(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(seed)))
            .cast("double")
            + F.lit(0.5)
        ) / F.lit(HASH_SPACE)
        gumbel = -F.log(-F.log(u))
        score = F.col("weight_e6") + F.floor(
            F.lit(1_000_000.0 * float(temperature)) * gumbel
        ).cast("bigint")
    scored = weights.withColumn("score_e6", score)
    # sort+limit FIRST (compiles to TakeOrderedAndProject — bounded
    # per-task heaps, no global sort; a global-window rank filter
    # would not get the map-side pushdown, InferWindowGroupLimit
    # needs a non-empty partitionSpec), then rank the k survivors —
    # the window runs on a k-row frame.
    top = scored.orderBy(F.col("score_e6").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score_e6").desc(), F.col(id_col))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        id_col,
        "n_grams",
        "weight_e6",
        "score_e6",
    )
