"""Trainable text-quality classifier (hashed-feature logistic
regression) — the DCLM/fastText-style curation gate: fit a linear
model on hashed bag-of-ngram features over a labeled slice, then
score the whole corpus and keep what clears the threshold. This is
the standard "quality classifier" stage of a modern pretraining
pipeline (GPT-3 §2.2's LR-over-features filter, DCLM-baseline's
fastText filter), re-expressed Spark-first. SURVEY.md §2.10 extended
surface — net-new, no reference analogue (the reference has no
trainable ops).

Model: logistic-style regression over ``hashed_gram_buckets``
features (unigram+bigram hashing trick, ``selection.py``), trained by
full-batch gradient descent with the ELLIOTT fast sigmoid

    sig(x) = 0.5 + 0.5 * x / (1 + |x|)

instead of the exponential one. The choice is deliberate and
load-bearing: sig() uses only +,*,/,|·| — every one an exactly-
rounded IEEE-754 op — so identical integer inputs produce identical
doubles on every engine, while exp() is libm-dependent and breaks
cross-engine bit-parity. Same monotone S-curve, same decision
boundary at 0.5, gradient-friendly; documented by Elliott (1993).

The update is DIAGONALLY PRECONDITIONED (per-coordinate step =
1/bucket-mass — the same per-feature scaling family as fastText's
sparse updates): a plain 1/N full-batch step either oscillates (raw
counts put the feature scale at ~tokens-per-doc) or crawls (bucket
gradients are orders of magnitude apart in mass), both measured on
the test corpus before this design was fixed. Normalizing each
bucket's step by its own count mass moves every weight toward the
negative average residual of the docs that touch it — bounded
±lr·1e6 per round — and reaches >95% train accuracy in ~12 rounds
where the plain step was still at the majority baseline.

Cross-engine doctrine (the ``preference.py`` Bradley-Terry pattern —
quantize-then-integer-sum makes an ITERATIVE float algorithm
hash-gateable):

    m_e6(d)   = SUM_b cnt(d,b) * w_e6[b] + bias_e6     -- exact BIGINT
    p(d)      = sig(m_e6 / 1e6)                        -- per-row IEEE chain
    r_e6(d)   = floor((p - y) * 1e6)                   -- BIGINT residual
    num_e6[b] = SUM_d cnt(d,b) * r_e6(d)               -- exact BIGINT
    den_e6[b] = SUM_d cnt(d,b) * 1e6                   -- exact BIGINT, once
    w_e6[b]  -= floor(num_e6[b] * lr * 1e6 / den_e6[b])-- BIGINT update
    bias_e6  -= floor(SUM_d r_e6(d) * lr / N)          -- BIGINT update

Every cross-row SUM is an exact integer sum (no float-associativity
hazard, shuffle-order-free); every float op is a per-row chain from
identical integers with fixed associativity ((num·lr)·1e6/den, int→
double conversions exact below 2^53 — bounds: a bucket's labeled-set
mass < 9e9 occurrences, a doc's tokens·max|w_e6| < 9e15). A
fixed-iteration run therefore replays bit-for-bit in DuckDB (unrolled
CTEs — probe q_x39), in pure Python (parity pin in tests), and across
cluster sizes.

Execution shape per iteration: ONE broadcast join of the (doc, bucket,
cnt) feature frame against the ≤``buckets``-row weight table, ONE
groupBy(doc) margin aggregation, ONE groupBy(bucket) gradient
aggregation — two keyed shuffles of at most nnz rows, both with
map-side partial aggregation. The weight vector lives on the driver
between iterations (the parameter-server role; ``buckets`` is a
bounded user parameter, ≤2^20, so the per-iteration collect is
control-plane-sized by construction — the documented size-gated
pattern of ``preference._bt_driver`` / ``dedup.connected_components``).
The feature and label frames are persisted once and reused by every
iteration; nothing fact-sized ever collects.

At 100 TB: features are one explode + one (doc,bucket) two-phase agg
over the corpus (the DSIR scan, selection.py); each GD iteration then
touches only the materialized nnz frame. Scoring is one broadcast
join + one agg — embarrassingly parallel, no state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = [
    "train_text_classifier",
    "classifier_margins",
    "score_documents",
    "train_quality_filter",
]

#: bias rides in the weight table under this reserved bucket id.
BIAS_BUCKET = -1


def _sig(x):
    """Elliott fast sigmoid as a Column expression (arithmetic-only;
    see module docstring for why not exp)."""
    return 0.5 + 0.5 * x / (1.0 + F.abs(x))


def _margins_e6(features: DataFrame, weights: DataFrame, id_col: str) -> DataFrame:
    """(id, n_grams, margin_e6): exact-BIGINT margins of every doc in
    ``features`` under ``weights`` — the one shared scoring kernel of
    the train loop and ``classifier_margins``. Docs whose every bucket
    misses the weight table still surface (cnt*NULL -> 0 via the left
    join + coalesce), so scoring never drops rows."""
    w = F.broadcast(weights.where(F.col("b") != BIAS_BUCKET))
    # A weight table WITHOUT a bias row (frozen/external models often
    # carry only bucket weights) must read as bias 0, not as an empty
    # cross join that silently drops every document: the one-row agg
    # always yields exactly one row (sum over no rows -> NULL -> 0).
    bias = weights.where(F.col("b") == BIAS_BUCKET).agg(
        F.coalesce(F.sum("w_e6"), F.lit(0)).cast("long").alias("w_e6")
    )
    joined = features.join(w, "b", "left")
    per_doc = joined.groupBy(F.col(id_col)).agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum(
            F.col("cnt") * F.coalesce(F.col("w_e6"), F.lit(0))
        ).cast("long").alias("_dot_e6"),
    )
    return per_doc.join(
        F.broadcast(bias.select(F.col("w_e6").alias("_bias_e6"))), how="cross"
    ).select(
        id_col,
        "n_grams",
        (F.col("_dot_e6") + F.col("_bias_e6")).cast("long").alias("margin_e6"),
    )


def _weights_df(spark, w_e6: dict[int, int]) -> DataFrame:
    rows = sorted(w_e6.items())
    schema = StructType(
        [StructField("b", LongType(), False), StructField("w_e6", LongType(), False)]
    )
    return spark.createDataFrame(rows, schema)


def train_text_classifier(
    features: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
    label_col: str = "label",
    iters: int = 12,
    lr: float = 0.5,
    max_buckets: int = 1 << 20,
    driver_max_nnz: int = 2_000_000,
) -> DataFrame:
    """Fit the quantized logistic model; returns the weight table
    ``(b BIGINT, w_e6 BIGINT)`` (micro-units; bias at ``b = -1``).

    ``features`` is a sparse ``(id, b, cnt)`` frame (use
    ``selection.hashed_gram_buckets``); ``labels`` is ``(id, label)``
    with label in {0,1}. Exactly ``iters`` rounds of the mass-
    normalized full-batch update in the module docstring; weights
    init to 0, so the run is deterministic end-to-end — no RNG, no
    float-sum hazard — and replays bit-for-bit in DuckDB / pure
    Python (pinned by test and probe q_x39). ``lr`` must be a dyadic
    rational (0.5, 0.25, ...) so the float chain stays exact.

    ``max_buckets`` refuses a feature space too large for the
    driver-held model (the ``fuzzyjoin.max_block_rows`` message
    discipline); 2^20 weights ≈ 16 MB, comfortably control-plane.

    Two paths share the one arithmetic spec (the ``preference.py``
    Bradley-Terry pattern): a labeled-set nnz at or under
    ``driver_max_nnz`` collects the AGGREGATED (id, b, cnt, y) frame
    once and iterates in numpy int64 (every cross-row sum an exact
    integer add — ``np.add.at``, never float accumulation), because a
    distributed round pays two fixed-latency jobs for what is then
    sub-second arithmetic; bigger labeled sets run the same update as
    per-iteration joins/aggs and never collect facts. Bit-exact path
    parity is pinned by test.
    """
    if iters < 1:
        raise ValueError("train_text_classifier: iters must be >= 1")
    # The bit-exact replay contract leans on lr being a power of two:
    # num*lr*1e6/den then stays a chain of exactly-rounded IEEE ops on
    # both engines. Enforce it instead of documenting it — frexp
    # mantissa 0.5 <=> lr is exactly 2^k.
    if not (0.0 < lr <= 1.0) or math.frexp(lr)[0] != 0.5:
        raise ValueError(
            f"train_text_classifier: lr={lr!r} is not a power-of-two in "
            "(0, 1] (0.5, 0.25, 0.125, ...) — required for the bit-exact "
            "cross-engine replay contract (module docstring)."
        )
    spark = features.sparkSession
    f = (
        features.select(
            F.col(id_col).alias("_id"),
            F.col("b").cast("long").alias("b"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        .join(
            labels.select(
                F.col(id_col).alias("_id"),
                F.col(label_col).cast("long").alias("_y"),
            ),
            "_id",
        )
        .persist()
    )
    # ONE gate aggregation over the cached frame: bucket count, doc
    # count and nnz were three separate driver jobs answering three
    # questions the same pass can answer (guide §1.2).
    gate = f.agg(
        F.count_distinct("b").alias("_nb"),
        F.count_distinct("_id").alias("_ndocs"),
        F.count(F.lit(1)).alias("_nnz"),
    ).collect()[0]
    n_buckets = int(gate["_nb"])
    if n_buckets > max_buckets:
        f.unpersist()
        raise ValueError(
            f"train_text_classifier: {n_buckets} distinct feature buckets "
            f"exceed max_buckets={max_buckets} — the weight vector is "
            "driver-held model state. Re-featurize with fewer hash "
            "buckets, or raise max_buckets if the driver can hold it."
        )
    n_docs = int(gate["_ndocs"])
    if n_docs == 0:
        f.unpersist()
        raise ValueError("train_text_classifier: no labeled feature rows")

    nnz = int(gate["_nnz"])
    if nnz <= int(driver_max_nnz):
        w = _train_driver(f, iters, lr)
        f.unpersist()
        return _weights_df(spark, w)

    # Per-bucket count mass — the diagonal preconditioner. Iteration-
    # independent, so it is computed ONCE (<= buckets rows).
    den_e6: dict[int, int] = {
        int(r["b"]): int(r["d"])
        for r in f.groupBy("b")
        .agg((F.sum("cnt") * F.lit(1_000_000)).cast("long").alias("d"))
        .collect()
    }

    w_e6: dict[int, int] = {BIAS_BUCKET: 0}
    for _ in range(iters):
        wdf = _weights_df(spark, w_e6)
        m = _margins_e6(f.select(F.col("_id").alias(id_col), "b", "cnt"), wdf, id_col)
        resid = (
            m.join(
                f.select(F.col("_id").alias(id_col), "_y").distinct(), id_col
            )
            .select(
                id_col,
                F.floor(
                    (_sig(F.col("margin_e6") / 1e6) - F.col("_y")) * 1e6
                ).cast("long").alias("r_e6"),
            )
        )
        grads = (
            f.select(F.col("_id").alias(id_col), "b", "cnt")
            .join(resid, id_col)
            .groupBy("b")
            .agg(F.sum(F.col("cnt") * F.col("r_e6")).cast("long").alias("num_e6"))
            .collect()  # <= buckets rows: the model, not the facts
        )
        bias_g = resid.agg(F.sum("r_e6").cast("long").alias("g")).collect()[0]["g"]
        for row in grads:
            b = int(row["b"])
            w_e6[b] = w_e6.get(b, 0) - math.floor(
                int(row["num_e6"]) * lr * 1e6 / den_e6[b]
            )
        w_e6[BIAS_BUCKET] -= math.floor(int(bias_g) * lr / n_docs)
    f.unpersist()
    return _weights_df(spark, w_e6)


def _train_driver(f: DataFrame, iters: int, lr: float) -> dict[int, int]:
    """Size-gated control-plane path: the quantized update of the
    module docstring in numpy int64 over the collected AGGREGATED
    (id, b, cnt, y) frame (bounded by the caller's ``driver_max_nnz``
    gate, never raw facts). Every cross-row sum is an exact int64
    scatter-add (``np.add.at``); the sigmoid/residual chain is
    vectorized float64 — element-wise IEEE, identical to the joins
    path's per-row chain. Bit-exact parity with the joins path is
    pinned by test."""
    import numpy as np
    import pandas as pd

    pdf = f.select("_id", "b", "cnt", "_y").toPandas()  # Arrow batch xfer
    di, _ = pd.factorize(pdf["_id"], sort=False)
    bi, bs = pd.factorize(pdf["b"], sort=False)
    di = di.astype(np.int64)
    bi = bi.astype(np.int64)
    cnt = pdf["cnt"].to_numpy(dtype=np.int64)
    n_docs = int(di.max()) + 1 if len(di) else 0
    y = np.zeros(n_docs, dtype=np.int64)
    y[di] = pdf["_y"].to_numpy(dtype=np.int64)  # constant per doc

    den = np.zeros(len(bs), dtype=np.int64)
    np.add.at(den, bi, cnt * 1_000_000)
    w = np.zeros(len(bs), dtype=np.int64)
    bias = 0
    for _ in range(iters):
        m = np.full(n_docs, bias, dtype=np.int64)
        np.add.at(m, di, cnt * w[bi])
        z = m / 1e6
        p = 0.5 + 0.5 * z / (1.0 + np.abs(z))
        r_e6 = np.floor((p - y) * 1e6).astype(np.int64)
        num = np.zeros(len(bs), dtype=np.int64)
        np.add.at(num, bi, cnt * r_e6[di])
        w = w - np.floor(num * lr * 1e6 / den).astype(np.int64)
        bias -= math.floor(int(r_e6.sum()) * lr / n_docs)
    out = {int(b): int(wv) for b, wv in zip(bs.tolist(), w)}
    out[BIAS_BUCKET] = int(bias)
    return out


def classifier_margins(
    features: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    threshold_e6: int = 0,
) -> DataFrame:
    """Score every doc in ``features`` under a trained (or frozen)
    weight table: ``(id, n_grams, margin_e6, score, keep)`` where
    ``score = sig(margin)`` in [0,1] and ``keep = margin_e6 >
    threshold_e6``. margin_e6/keep are exact integers (hash-gateable);
    score is the per-row IEEE chain. One broadcast join + one agg —
    no shuffle beyond the (doc) agg, scales linearly."""
    m = _margins_e6(features, weights, id_col)
    return m.select(
        id_col,
        "n_grams",
        "margin_e6",
        F.round(_sig(F.col("margin_e6") / 1e6), 6).alias("score"),
        (F.col("margin_e6") > F.lit(int(threshold_e6))).alias("keep"),
    )


def train_quality_filter(
    docs: DataFrame,
    label_expr,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 2048,
    iters: int = 12,
    lr: float = 0.5,
    portable: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Convenience facade: featurize ``docs`` with
    ``hashed_gram_buckets``, train on ``label_expr`` (a boolean/0-1
    Column over ``docs``), and return ``(weights, scored)`` where
    ``scored`` is ``classifier_margins`` over the SAME corpus. The
    real pipeline trains on a labeled slice and scores everything;
    pass a pre-filtered ``docs`` to train, then call
    ``classifier_margins`` on the full corpus's features yourself."""
    from .selection import hashed_gram_buckets

    feats = (
        hashed_gram_buckets(
            docs, id_col=id_col, text_col=text_col, buckets=buckets, portable=portable
        )
        .withColumnRenamed("_id", id_col)  # the featurizer's internal name
        .persist()
    )
    labels = docs.select(
        F.col(id_col), label_expr.cast("long").alias("label")
    )
    try:
        weights = train_text_classifier(
            feats, labels, id_col=id_col, iters=iters, lr=lr
        )
        # Materialize the scores off the still-cached features (one
        # cheap in-memory pass), then release the cache: consumers
        # read the checkpointed scores instead of re-tokenizing the
        # corpus, and nothing stays pinned. No cache leak — including
        # on the trainer's refusal paths (the finally below).
        scored = classifier_margins(
            feats, weights, id_col=id_col
        ).localCheckpoint(eager=True)
    finally:
        feats.unpersist()
    return weights, scored


def _margin_gather_udf(spark, keys, vals, bias: int, buckets: int):
    """Scale twin of ``score_documents``' literal-map fold: a pandas
    UDF mapping a JVM-computed bucket-id array to the exact int64
    margin via a dense broadcast weight array. Refuses a weight table
    whose bucket ids fall outside [0, buckets) — that is a
    model/featurization mismatch (same hash-family doctrine as the CDC
    maintainers), not something to index past silently.

    Broadcast lifecycle: the dense array (8 MB at the trainer's 2^20
    cap) is referenced only by the returned UDF's closure — when the
    caller drops the scored DataFrame, Spark's ContextCleaner
    reference-tracks the broadcast and unpersists it; an explicit
    destroy() here would instead break any still-live frame built
    from a prior call."""
    kk = np.asarray(keys, dtype=np.int64)
    if kk.size and (int(kk.min()) < 0 or int(kk.max()) >= buckets):
        raise ValueError(
            f"score_documents: weight bucket ids span "
            f"[{int(kk.min())}, {int(kk.max())}] but buckets={buckets} — "
            "the weights were trained under a different featurization."
        )
    if len(np.unique(kk)) != kk.size:
        # the literal-map path throws on duplicate keys (Spark's
        # mapKeyDedupPolicy=EXCEPTION); `dense[kk] = vals` would
        # silently keep the LAST value — same malformed model must
        # fail loudly on both paths
        raise ValueError(
            "score_documents: duplicate bucket ids in the weights "
            "table — the model is malformed (one weight per bucket)."
        )
    dense = np.zeros(buckets, dtype=np.int64)
    dense[kk] = np.asarray(vals, dtype=np.int64)
    bc = spark.sparkContext.broadcast(dense)

    @F.pandas_udf("long")
    def _margin(bucket_ids: pd.Series) -> pd.Series:
        w = bc.value
        out = []
        for ids in bucket_ids:
            if ids is None:
                out.append(None)  # NULL text -> NULL margin (parity)
            else:
                a = np.asarray(ids, dtype=np.int64)
                out.append(int(w[a].sum()) + bias if a.size else bias)
        return pd.Series(pd.array(out, dtype="Int64"))

    return _margin


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 2048,
    portable: bool = True,
    threshold_e6: int = 0,
    max_map_entries: int = 1 << 14,
) -> DataFrame:
    """ZERO-SHUFFLE corpus scoring — the 100 TB path, and streaming-
    safe for free: the trained model collects once (it is
    ``<= max_buckets`` rows by the trainer's gate), becomes a LITERAL
    map expression broadcast inside the plan, and each document's
    margin folds over its own gram array row-locally —

        margin_e6 = aggregate(grams, 0L,
                              (acc, g) -> acc + coalesce(w[bucket(g)], 0))

    No explode, no (doc, bucket) aggregation, no keyed exchange:
    scoring a 100 TB corpus is a pure codegen'd projection over the
    scan (the only Exchange that can ever appear is ``spread``'s
    round-robin on a too-small input — a no-op on real scans), and
    because it is a stateless per-row map it runs UNCHANGED
    on a streaming DataFrame (append mode, no watermark, no state) —
    the streaming twin is the same function. Identical output to
    ``classifier_margins`` over ``hashed_gram_buckets`` features with
    the same (buckets, portable) — per-gram-occurrence weight sums ARE
    cnt-weighted sums — pinned by test; margins stay exact BIGINTs.

    ``buckets``/``portable`` MUST match the featurization the weights
    were trained on (same doctrine as the CDC maintainers' hash-family
    contract). The bigram array is built from a materialized token
    column — inlining the tokenizer into the transform lambda would
    re-run it per element (the ``_token_ngrams`` O(len²) lesson).
    One visible edge: a NULL ``text_col`` scores as NULL margin here
    (a row-local map keeps the row), where the explode-based
    ``classifier_margins`` path silently drops the doc from features.

    The literal map is a PARSED SQL STRING handed to the driver
    planner, so it is size-capped at ``max_map_entries`` non-bias
    weights (~2^14; measured: parse+plan is ~1.6 s there and turns
    superlinear past 2^15, with the map re-serialized into every task
    binary). Larger models switch to the scale twin automatically:
    bucket ids are still computed JVM-side by the same
    ``_gram_bucket`` expression, and the margin becomes an
    Arrow-batched numpy gather over a DENSE int64 weight array
    (``buckets`` slots, 8 MB at the trainer's 2^20 cap) shipped once
    per executor via ``SparkContext.broadcast`` — still a stateless
    row-local projection (zero shuffle, streaming-safe), just crossing
    the Arrow boundary instead of codegen. Exactness is preserved:
    the gather sums int64 weights, the same integers the fold adds.
    """
    from .selection import _gram_bucket

    rows = sorted(
        (int(r["b"]), int(r["w_e6"])) for r in weights.collect()
    )
    bias = 0
    keys, vals = [], []
    for b, w in rows:
        if b == BIAS_BUCKET:
            bias = w
        else:
            keys.append(b)
            vals.append(w)

    from ..functions import spread, ws_tokens

    # compute-heavy narrow stage: a small input arriving as one scan
    # partition would hash every gram on one core (spread is a no-op
    # on real multi-partition scans — SCALE doctrine in functions.py).
    # A streaming frame has no partition count to inspect; micro-batch
    # parallelism comes from the source there.
    if not docs.isStreaming:
        docs = spread(docs)
    bigrams = F.transform(
        F.slice(F.col("_toks"), 1, F.greatest(F.size("_toks") - 1, F.lit(0))),
        lambda t, i: F.concat_ws(" ", t, F.col("_toks")[i + 1]),
    )
    if len(keys) <= int(max_map_entries):
        # ONE parsed SQL literal, not 2*len(keys) F.lit() Column
        # objects: per-element construction pays a py4j round trip per
        # literal (measured ~4 s per call at 1024 buckets).
        if keys:
            entries = ", ".join(
                f"{k}L, {v}L" for k, v in zip(keys, vals)
            )
            wmap = F.expr(f"map({entries})")
        else:
            wmap = F.expr("map_from_arrays(array(), array())").cast(
                "map<bigint,bigint>"
            )
        margin = F.aggregate(
            F.col("_grams"),
            F.lit(int(bias)).cast("long"),
            lambda acc, g: acc
            + F.coalesce(
                F.element_at(wmap, _gram_bucket(g, buckets, portable)),
                F.lit(0).cast("long"),
            ),
        )
    else:
        margin = _margin_gather_udf(
            docs.sparkSession, keys, vals, int(bias), int(buckets)
        )(
            F.transform(
                F.col("_grams"), lambda g: _gram_bucket(g, buckets, portable)
            )
        )
    return (
        docs.withColumn("_toks", ws_tokens(F.col(text_col)))
        .withColumn("_grams", F.concat(F.col("_toks"), bigrams))
        .withColumn("n_grams", F.size("_grams").cast("long"))
        .withColumn("margin_e6", margin)
        .withColumn("score", F.round(_sig(F.col("margin_e6") / 1e6), 6))
        .withColumn("keep", F.col("margin_e6") > F.lit(int(threshold_e6)))
        .drop("_toks", "_grams")
    )
