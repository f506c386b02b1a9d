"""Text analysis operators for training-data pipelines (SURVEY.md §2.10
X4 — net-new north-star surface).

All JVM-side expression compositions (regexp/array/aggregate), each
with a DuckDB-expressible twin for the oracle:

- token_count:     whitespace + BPE-ish regex token counts
- language_id:     stopword-lexicon n-gram heuristic (deterministic)
- quality_score:   length/punctuation/stopword-ratio scoring
- doc_fingerprint: polynomial rolling hash over tokens
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import norm_text

#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
#: (ASCII classes — portable to DuckDB's RE2; extend for production).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword lexicons for the n-gram/lexicon heuristic.
#: Deterministic and portable — NOT a production language detector.
LANG_LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"],
}


def ws_token_count(c: Column) -> Column:
    """Whitespace token count of normalized text."""
    return F.size(F.split(norm_text(c), " "))


def bpe_token_count(c: Column) -> Column:
    """BPE-ish regex token count (letters / digits / punct pieces)."""
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def punct_ratio(c: Column) -> Column:
    stripped = F.regexp_replace(c, r"[^A-Za-z0-9\s]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(c: Column, lexicon: list[str]) -> Column:
    toks = F.split(norm_text(c), " ")
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in lexicon])))
    return hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        id_col,
        F.length(c).alias("n_chars"),
        ws_token_count(c).alias("n_ws_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Predict language = lexicon with the largest distinct-token
    overlap; ties broken by language code (deterministic).

    One pass: per-language hit counts as parallel expressions, then a
    greatest-of struct comparison — no explode, no shuffle."""
    toks = F.array_distinct(F.split(norm_text(F.col(text_col)), " "))
    scored = df.select(F.col(id_col), toks.alias("_toks"))
    structs = []
    for lang in sorted(LANG_LEXICONS):
        lex = F.array(*[F.lit(s) for s in LANG_LEXICONS[lang]])
        hits = F.size(F.array_intersect(F.col("_toks"), lex))
        # order by (hits desc, lang asc): negate lang via struct order
        structs.append(F.struct(hits.alias("h"), F.lit(lang).alias("l")))
    arr = F.array(*structs)
    # max over (h, -l): sort ascending by h then by l DESC would pick
    # wrong tie-break; instead reverse-sort and take the struct with
    # max h, min l: array_sort by (h desc, l asc) -> element_at 1
    best = F.array_sort(
        arr,
        lambda x, y: F.when(x["h"] > y["h"], -1)
        .when(x["h"] < y["h"], 1)
        .when(x["l"] < y["l"], -1)
        .when(x["l"] > y["l"], 1)
        .otherwise(0),
    )[0]
    return scored.select(
        id_col,
        best["l"].alias("pred_lang"),
        # long for dtype parity with SQL engines' len() (BIGINT)
        best["h"].cast("long").alias("lex_hits"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality: rewards reasonable length and stopword
    presence, penalizes punctuation density. Deterministic arithmetic
    (matches the oracle to 6 d.p.)."""
    c = F.col(text_col)
    n_tok = ws_token_count(c)
    mean_wlen = F.length(norm_text(c)) / F.greatest(n_tok, F.lit(1))
    sw = stopword_ratio(c, LANG_LEXICONS["en"])
    pr = punct_ratio(c)
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + sw * 0.3
        + (1.0 - F.least(pr * F.lit(10.0), F.lit(1.0))) * 0.2
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.1).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(sw, 6).alias("stopword_ratio"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


FP_P = 2_147_483_647
FP_MUL = 31


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive rolling hash over tokens:
    fp = fold(tokens, acc -> (acc*31 + hash30(token)) mod P).
    Portable: DuckDB twin uses list_reduce with identical arithmetic."""
    toks = F.split(norm_text(F.col(text_col)), " ")
    h30 = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % F.lit(1 << 30)
    )
    fp = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FP_MUL + h30(t)) % FP_P,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def lm_score(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """In-corpus bigram language-model scoring (the KenLM-style
    perplexity filter stage of pretraining pipelines, self-trained):
    count corpus-wide bigrams ``(prev, tok)`` with a ``<s>`` BOS
    context, then score every document by its mean token log-likelihood
    under add-``k`` smoothing::

        P(tok | prev) = (c(prev, tok) + k) / (c(prev) + k * V)

    with ``V`` the corpus vocabulary size. Output: ``(id, n_tokens,
    avg_logp, ppl)`` where ``ppl = exp(-avg_logp)`` — low-likelihood
    (high-perplexity) documents are the filter's outlier candidates.

    Plan shape: one narrow bigram projection feeds BOTH the count
    tables and the scoring stream (Catalyst reuses the subquery); the
    count tables are vocabulary-bounded (tiny relative to the corpus),
    so scoring is two keyed equi-joins — ``(prev, tok)`` then
    ``prev`` — followed by one per-document aggregation. No Python,
    no windows; skewed contexts (stopwords) ride AQE skew splitting.
    """
    toks_df = df.select(
        F.col(id_col).alias("_id"),
        F.split(norm_text(F.col(text_col)), " ").alias("_toks"),
    )
    bigrams = toks_df.select(
        "_id",
        F.explode(
            F.transform(
                F.col("_toks"),
                lambda t, i: F.struct(
                    F.when(i == 0, F.lit("<s>"))
                    .otherwise(F.get(F.col("_toks"), i - 1))
                    .alias("prev"),
                    t.alias("tok"),
                ),
            )
        ).alias("bg"),
    ).select("_id", F.col("bg.prev").alias("prev"), F.col("bg.tok").alias("tok"))

    # The bigram count table feeds THREE consumers (context counts,
    # the scoring join, and — via tok — the vocabulary size); it is
    # vocabulary-bounded, so materialize it once instead of re-running
    # the corpus explode per consumer. Every token occurs as some
    # bigram's tok, so V comes from this tiny frame, not from a
    # separate distinct-count job over the raw bigram stream.
    # Materialization policy (SCALE.md §24, measured at sf1):
    # localCheckpoint reads back ~3-5x faster than a columnar persist
    # locally, but has NO lineage fallback — at cluster scale swap
    # fact-sized checkpoints for persist(MEMORY_AND_DISK)+unpersist
    # or a reliable checkpoint dir if executor loss matters.
    bg_counts = (
        bigrams.groupBy("prev", "tok")
        .agg(F.count("*").alias("c_bg"))
        .localCheckpoint(eager=True)
    )
    ctx_counts = bg_counts.groupBy("prev").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = bg_counts.select("tok").distinct().count()

    logp = F.log(
        (F.col("c_bg") + F.lit(k)) / (F.col("c_ctx") + F.lit(k) * vocab)
    )
    scored = (
        bigrams.join(bg_counts, ["prev", "tok"])
        .join(ctx_counts, "prev")
        .groupBy("_id")
        .agg(F.count("*").alias("n_tokens"), F.avg(logp).alias("_alp"))
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.round(F.col("_alp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.col("_alp")), 6).alias("ppl"),
    )


def bpe_pair_counts(
    df: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-vocabulary induction, step one of BPE training: count
    adjacent character pairs inside whitespace words across the corpus
    and return the ``top_k`` merge candidates.

    Output: ``(pair, n_occ, n_docs)`` ordered by ``n_occ`` desc then
    ``pair`` (a deterministic total order, so the top-k cut is stable
    across engines and runs).

    Plan shape at 100 TB: two narrow explodes (words, then in-word
    pairs) feeding ONE two-phase hash aggregate keyed by ``pair`` —
    the pair alphabet is tiny (≤ alphabet², a few thousand keys), so
    map-side partial aggregation collapses each input partition to at
    most that many rows before the exchange, and the final top-k is
    a ``TakeOrderedAndProject`` over a vocabulary-sized frame. One
    such job per BPE merge iteration is the standard distributed
    formulation.
    """
    from ..functions import spread

    base = spread(
        df.select(
            F.col(id_col).alias("_id"),
            F.split(norm_text(F.col(text_col)), " ").alias("_ws"),
        )
    )
    words = base.select("_id", F.explode("_ws").alias("_w")).where(
        F.length("_w") >= 2
    )
    pairs = words.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_w") - 1),
                lambda i: F.col("_w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(top_k)
    )


def canonicalize_url(c: Column) -> Column:
    """Web-corpus URL canonicalization (the CCNet/RefinedWeb dedup
    key): lowercase, strip scheme and ``www.``, drop the fragment,
    drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
    ``ref``), drop an emptied ``?``, strip the trailing slash.

    Pure built-in regexp chain — engine-portable (each step is one
    POSIX-class regexp_replace a SQL oracle replays verbatim), scans
    at codegen speed, no UDF."""
    u = F.lower(F.trim(c))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")  # scheme
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # tracking params, delimiter-safe: drop '&'-prefixed ones outright
    # (keeps the remaining query intact), then a '?'-prefixed one
    # hands its '?' to the next param or vanishes with the query.
    # Replacing '&param' with '?' (the old form) forged a second '?'
    # mid-query ('a.com/p?x=1?y=2'), so the same page canonicalized
    # differently depending on where the tracker sat.
    u = F.regexp_replace(u, r"&(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*", "")
    u = F.regexp_replace(u, r"\?(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*$", "")
    u = F.regexp_replace(u, r"[?&]+$", "")  # emptied query
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_domain(c: Column) -> Column:
    """Registrable-host extraction from a CANONICALIZED url (everything
    before the first ``/``, ``?`` or ``:``)."""
    return F.regexp_extract(c, r"^([^/:?]+)", 1)


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus accounting over canonicalized URLs: document
    count, distinct canonical URLs (url-level dedup headroom), and the
    min-id keeper per domain. One two-phase hash agg."""
    canon = df.select(
        F.col(id_col), canonicalize_url(F.col(url_col)).alias("_cu")
    ).withColumn("_dom", url_domain(F.col("_cu")))
    return canon.groupBy(F.col("_dom").alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_cu").alias("n_unique_urls"),
        F.min(id_col).alias("keeper_doc_id"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keyword extraction by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the sklearn smooth_idf form).

    Plan: one explode + two two-phase hash aggs (per-(doc,term) tf;
    per-term df) + a broadcast of the term-df dimension back, then the
    per-doc top-k compiles through two-phase ``WindowGroupLimit`` —
    each partition forwards at most k rows per doc into the exchange.
    Scores are rounded to 6 d.p. BEFORE ranking (ties then break on
    the term string), which pins the selected terms across engines —
    raw ln() can differ in the last ulp between libms, and an argmax
    must not hinge on it.

    Output: (id, term, tf, df, tfidf, rank).
    """
    from pyspark.sql import Window

    from ..functions import norm_text, spread

    toks = (
        spread(df.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
    )
    # tf feeds TWO consumers (the df dimension and the scored join):
    # materialize it once so the corpus is tokenized once, not twice
    # (the captured q_x27 plan held two Scan+Generate legs). The
    # (doc, term, tf) frame is exactly the intermediate a 100 TB run
    # stages before computing document frequencies anyway.
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(F.broadcast(df_t), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * (
                F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1))
                + F.lit(1.0)
            ),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            "tfidf",
            # long for dtype parity with SQL engines' row_number (BIGINT)
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ngram_novelty(
    candidates: "DataFrame",
    reference: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> "DataFrame":
    """Novelty of each candidate document against a reference corpus:
    the fraction of the doc's DISTINCT character k-gram shingles that
    the reference has never seen. The inverse of decontamination
    (curation.py flags overlap to EXCLUDE; this scores it as a signal
    — low novelty ~ boilerplate / near-copies, high novelty ~ genuinely
    new text worth keeping or reviewing).

    Output: (doc_id, n_shingles, n_seen, novelty = 1 - seen/total);
    docs shorter than k emit NULL novelty (no shingles) rather than
    vanishing.

    Scale: the reference collapses to its DISTINCT shingle set once
    (hash agg); candidate shingles left-semi-ish join against it via
    an aggregated boolean (one shuffle keyed on shingle, the standard
    frequency-skew shape — common shingles hash-spread because the
    key space is the shingle value, and no row carries more than the
    doc's own shingle list). No UDFs.
    """
    from .dedup import shingles

    cand = shingles(candidates, id_col, text_col, k=k)
    ref = shingles(reference, id_col, text_col, k=k).select("shingle").distinct()
    seen = ref.withColumn("_seen", F.lit(1))
    scored = (
        cand.join(seen, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_seen").alias("n_seen"),
        )
        .withColumn(
            "novelty", F.lit(1.0) - F.col("n_seen") / F.col("n_shingles")
        )
    )
    all_docs = candidates.select(id_col)
    return (
        all_docs.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
            "novelty",
        )
    )
