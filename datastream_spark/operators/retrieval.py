"""Hybrid retrieval primitives for training-data pipelines (SURVEY.md
§2.10 extended surface — net-new, no reference citation).

Curation pipelines routinely need "find the documents most relevant to
X" with BOTH a lexical signal (term overlap / TF) and a semantic signal
(embedding cosine), fused into one ranking. The standard parameter-free
fusion is reciprocal-rank fusion (RRF, Cormack & Clarke, SIGIR 2009):

    score(d) = sum over ranked lists L of  1 / (k0 + rank_L(d))

RRF only consumes RANKS, never raw scores, so it composes lists whose
score scales are incomparable (an integer term count vs a cosine) and
it is exactly reproducible across engines — which is why every probe
here is hash-gateable end-to-end.

Scale shape: each top-m list is a distributed heap top-k
(``orderBy(...).limit(m)`` compiles to TakeOrderedAndProject — no
global sort, no single-partition shuffle of the corpus); the rank
window then runs over the m surviving rows only, and the fusion is a
union + one map-side-combined groupBy over ≤ m×lists rows. Nothing is
proportional to corpus size except the scans that feed the heaps.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import ws_tokens


def ranked_topm(df: DataFrame, score_col: str, id_col: str, m: int) -> DataFrame:
    """Global top-``m`` rows by (``score_col`` DESC, ``id_col`` ASC)
    with a 1-based ``rank`` column attached.

    The top-m itself is ``orderBy(...).limit(m)`` — Spark compiles
    this to TakeOrderedAndProject (a per-partition bounded heap plus a
    driver merge of m rows), so the corpus is never globally sorted.
    The unpartitioned row_number window that assigns ranks afterwards
    only ever sees the m surviving rows (m = a user-facing top-k,
    small by definition), so WindowExec's move-everything-to-one-
    partition warning — which this window does emit — is bounded by
    construction, not by luck: it moves exactly m rows. (A constant
    partition key would silence it, but Catalyst folds foldable keys
    out of the spec, so the warning survives; documented here instead
    so the next operator doesn't chase it.)
    """
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    top = df.orderBy(*order).limit(int(m))
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def term_count_score(text: Column, terms: list[str]) -> Column:
    """Lexical relevance: total occurrences of the query terms among
    the whitespace tokens of the normalized text. An integer — ranks
    built on it can never diverge across engines on float noise."""
    if not terms:
        raise ValueError("term_count_score: need at least one term")
    match = lambda t: reduce(  # noqa: E731
        lambda a, b: a | b, [t == F.lit(term) for term in terms]
    )
    return F.size(F.filter(ws_tokens(text), match))


def lexical_topm(
    df: DataFrame,
    terms: list[str],
    m: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``m`` documents by query-term frequency (ties broken by id).
    Zero-score documents are not retrieved — a document sharing no
    term with the query is out of the lexical list, as in any
    inverted-index engine."""
    scored = df.select(
        F.col(id_col).alias("id"),
        term_count_score(F.col(text_col), terms).alias("score"),
    ).where(F.col("score") > 0)
    return ranked_topm(scored, "score", "id", m)


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k`` for a term query (Robertson et al., TREC-3;
    the Lucene ``+1``-floored IDF variant, so scores are always
    non-negative):

        score(D) = sum_t  ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
                          * tf_tD * (k1+1) / (tf_tD + k1*(1 - b + b*dl_D/avgdl))

    Upgrades ``term_count_score``'s raw frequency with the two
    corrections every retrieval stack applies — rarity weighting (IDF)
    and length normalization — while keeping the hybrid/RRF machinery
    unchanged (ranks in, ranks out).

    Scale shape — NO inverted index, NO explode, NO fact-sized
    shuffle: with a query of a few terms, per-term tf and doc length
    are array-function columns on ONE projection of the corpus
    (``size(filter(tokens, ...))``); N / avgdl / every df_t reduce to
    a SINGLE one-row aggregate that broadcast-joins back onto the
    scoring scan; the top-k is a TakeOrderedAndProject bounded heap.
    The corpus is TOKENIZED EXACTLY ONCE: the (id, dl, tf...)
    projection is materialized behind a non-eager ``localCheckpoint``
    lineage barrier, so the stats aggregate computes it and the
    scoring pass re-reads the stored integer rows ((2+|terms|) ints
    per doc — ~1000x narrower than the text it replaces) instead of
    re-running the tokenizer over the documents (round-6 shipped two
    tokenizing scans; measured 2x at sf10, VERDICT r6 item 3).

    Cross-engine: scores round to 6 d.p. BEFORE ranking (the q_x27
    TF-IDF doctrine) with residual ties broken on id, so the selected
    set never hinges on a last-ulp ln() divergence; tf/dl/df/N are
    exact integers and avgdl = sum/count of integers is the identical
    IEEE double on both engines. Output: (id, dl, bm25, rank).
    """
    if not terms:
        raise ValueError("bm25_topk: need at least one term")
    # Dedup (order-preserving): a repeated query term must be
    # idempotent, matching term_count_score — otherwise the two
    # lexical scorers in hybrid_topk rank the same query differently.
    terms = list(dict.fromkeys(terms))
    toks = F.filter(
        ws_tokens(F.col(text_col)), lambda x: F.length(x) > F.lit(0)
    )

    # One-arg closures: a default-arg lambda would have arity 2, which
    # F.filter interprets as (element, index).
    def _is(term: str):
        return lambda x: x == F.lit(term)

    per = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, _is(t))).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # Lineage barrier (non-eager: nothing runs until the caller acts):
    # both the stats aggregate and the scoring projection consume
    # `per`, and without the barrier each branch is its own stage that
    # re-tokenizes the corpus. The checkpointed rows are all-integer
    # and bounded by doc count; storage is freed with the frame (no
    # session cache pinned — the persist-leak doctrine).
    per = per.localCheckpoint(eager=False)
    stats = per.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - float(b))
        + F.lit(float(b)) * F.col("dl") / F.col("_avgdl")
    )
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        contrib = (
            idf
            * F.col(f"_tf{i}")
            * F.lit(float(k1) + 1.0)
            / (F.col(f"_tf{i}") + norm)
        )
        score = contrib if score is None else score + contrib
    scored = (
        per.crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.col("dl").cast("long").alias("dl"),
            F.round(score, 6).alias("bm25"),
        )
        .where(F.col("bm25") > 0)
    )
    out = ranked_topm(scored, "bm25", "id", k)
    return out.withColumn("rank", F.col("rank").cast("long"))


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k0: float = 60.0,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ``ranked`` lists (each carrying
    ``id_col`` + a 1-based ``rank_col``).

    Output: (id, rrf_score, n_lists) — ``n_lists`` is how many input
    lists retrieved the id (consensus width, a useful quality signal
    in its own right). With the conventional k0=60 every term
    1/(k0+rank) is the same IEEE double on every engine, so the fused
    scores are bit-reproducible for ≤2 lists (two-term float addition
    is order-independent) and reproducible-after-round6 beyond that.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    contribs = [
        r.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "_rrf"
            ),
        )
        for r in ranked
    ]
    fused = (
        reduce(DataFrame.unionByName, contribs)
        .groupBy("id")
        .agg(
            F.sum("_rrf").alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
    )
    if top_n is not None:
        fused = fused.orderBy(F.col("rrf_score").desc(), F.col("id")).limit(
            int(top_n)
        )
    return fused


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int,
    m: int = 50,
    k: int = 20,
    k0: float = 60.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    lexical: str = "count",
) -> DataFrame:
    """Hybrid search: lexical top-m (query-term frequency, or BM25
    with ``lexical="bm25"``) fused with embedding-cosine top-m (query
    = the corpus vector ``query_vec_id``) by RRF, returning the fused
    top-``k``. RRF consumes only ranks, so swapping the lexical scorer
    never changes the fusion arithmetic.

    Assumes the conventional aligned id space (document i's embedding
    row carries vec_id == doc_id, as in the synthetic tables). The
    cosine list reuses ``cosine_topk``'s broadcast-query scan, so both
    branches stay corpus-scan + bounded-heap at any scale.
    """
    from .similarity import cosine_topk

    if lexical == "bm25":
        lex = bm25_topk(docs, terms, k=m, id_col=id_col, text_col=text_col)
    elif lexical == "count":
        lex = lexical_topm(docs, terms, m, id_col=id_col, text_col=text_col)
    else:
        raise ValueError(f"hybrid_topk: unknown lexical scorer {lexical!r}")
    vec_ranked = cosine_topk(
        embeddings, query_ids=[query_vec_id], k=m, id_col=vec_id_col, vec_col=vec_col
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    vec = vec_ranked.select(
        F.col("neighbor_id").alias("id"), F.row_number().over(w).alias("rank")
    )
    return rrf_fuse([lex, vec], k0=k0, top_n=k)
