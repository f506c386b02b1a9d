"""Corpus-curation operators for training-data pipelines (SURVEY.md
§2.10 extended surface — net-new, no reference citation; the reference
is a time-series store and has no document-pipeline surface).

Operators a 100 TB pretraining-data pipeline runs constantly:

- ``ngram_repetition``: per-document repetition quality signals
  (duplicate n-gram fraction, top-n-gram mass — the Gopher-style
  repetition filters).
- ``source_quota``: deterministic per-source document caps (domain
  balancing) via content-stable hash ranking.
- ``decontaminate``: flag training documents sharing token n-grams
  with a held-out evaluation set (train/test overlap removal).
- ``pack_sequences``: offset-based token packing — assign documents
  to fixed token-budget packs within independent shards (the
  concat-then-chunk layout used to build training batches).
- ``chunk_documents``: overlapping context-window chunking of each
  document (embedding / RAG indexing prep).
- ``redact_pii``: scrub PII-shaped spans with portable patterns,
  with per-document match accounting.

All JVM-side built-in expression compositions — no Python UDFs, no
driver-side loops. Every operator has a DuckDB-expressible twin
(probes q_x12..q_x17 in probes_llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import round6, spread, ws_tokens

__all__ = [
    "apply_mixture",
    "chunk_documents",
    "decontaminate",
    "decontaminate_bloom",
    "decontaminate_clean",
    "dedup_spans",
    "mixture_plan",
    "ngram_repetition",
    "pack_sequences",
    "redact_pii",
    "source_quota",
]


def _token_ngrams(toks, n: int):
    """ARRAY<STRING> of space-joined token n-grams (n>=1).

    ``toks`` MUST be a materialized column reference (not the
    tokenizer expression): the ``transform`` lambda reads ``toks`` per
    element, and an inlined expression tree would re-run the
    normalize+split regexp for every element — O(len²) per document
    (measured: 18s → 0.9s on q_x14). Callers select the token array
    into a column first.
    """
    if n == 1:
        return toks
    head = F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(
        head,
        lambda t, i: F.concat_ws(
            " ", t, *[F.get(toks, i + F.lit(j)) for j in range(1, n)]
        ),
    )


def ngram_repetition(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram repetition stats over normalized text.

    Output: ``(id, n_grams, n_distinct, top_count, dup_frac,
    top_frac)`` where ``dup_frac = 1 − distinct/total`` (fraction of
    gram occurrences that repeat an earlier gram) and ``top_frac`` is
    the mass of the single most frequent gram — the two signals behind
    Gopher/RefinedWeb repetition filters.

    Plan shape: explode → two-phase hash aggregate on
    ``(id, gram)`` (map-side combine collapses repeats before the
    shuffle — exactly the skew the filter is hunting), then a second
    partial-aggregated rollup to one row per document. Both stages are
    whole-stage-codegen'd; no Python, no windows.
    """
    base = spread(
        df.select(
            F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks")
        )
    )
    exploded = base.select(
        "_id", F.explode(_token_ngrams(F.col("_toks"), n)).alias("gram")
    )
    per_gram = exploded.groupBy("_id", "gram").agg(F.count("*").alias("cnt"))
    out = per_gram.groupBy("_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_count"),
    )
    return out.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_distinct",
        "top_count",
        round6(1.0 - F.col("n_distinct") / F.col("n_grams")).alias("dup_frac"),
        round6(F.col("top_count") / F.col("n_grams")).alias("top_frac"),
    )


def _sel_key(id_col):
    """Content-stable selection key: 60-bit integer from md5(id).

    Portable across engines (DuckDB: ``('0x' || substring(md5(..),1,15))
    ::BIGINT``) and across runs — the same document keeps the same rank
    forever, so re-running the pipeline on a grown corpus keeps prior
    selections stable up to the quota boundary.
    """
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def source_quota(
    df: DataFrame,
    quota: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap documents per group (domain balancing): keep the ``quota``
    documents with the smallest content-hash rank in each group.

    Rank = ``row_number`` over (group, md5-key, id) — deterministic,
    engine-portable, and independent of input order. One shuffle on
    ``group_col``.

    Scale note: ``group_col`` is typically low-cardinality (domains),
    so the window partition would be hot — but Spark ≥3.5 compiles the
    ``row_number <= quota`` filter to a two-phase ``WindowGroupLimit``
    (per-input-partition top-``quota`` BEFORE the exchange), so at most
    ``partitions × quota`` rows ever shuffle (plan-audited).
    """
    w = Window.partitionBy(group_col).orderBy(_sel_key(id_col), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= quota)
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents sharing ≥ ``min_shared`` distinct token
    ``n``-grams with ANY held-out document (train/test contamination).

    Returns ``(id, n_shared_grams)`` for flagged training docs; drop
    them with a left-anti join (``decontaminate_clean``).

    Plan shape: the *test* side (small — eval sets are thousands of
    docs, not billions) dedups to distinct grams and broadcasts. The
    training side joins its RAW gram stream against that broadcast set
    BEFORE any dedup, so the only rows that ever shuffle are the hits
    (rare by construction); per-doc distinct counting happens after,
    via partial-aggregated ``countDistinct``. The 100 TB side is
    scan → explode → broadcast hash join → tiny shuffle.
    """
    def grams_of(d):
        base = spread(
            d.select(
                F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks")
            )
        )
        return base.select(
            "_id", F.explode(_token_ngrams(F.col("_toks"), n)).alias("gram")
        )

    test_grams = grams_of(test).select("gram").distinct()
    hits = grams_of(train).join(F.broadcast(test_grams), "gram")
    return (
        hits.groupBy("_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= min_shared)
        .select(F.col("_id").alias(id_col), "n_shared_grams")
    )


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits, k hashes for n items at fpp."""
    import math

    n_items = max(n_items, 1)
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # whole 64-bit words
    k = max(1, round(math.log(2) * m / n_items))
    return m, k


def decontaminate_bloom(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    min_shared: int = 1,
    fpp: float = 0.01,
    verify: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``decontaminate`` for evaluation sets too large to broadcast as
    a raw gram set: membership-test training grams against a Bloom
    filter of the eval grams, then (``verify=True``) exact-join only
    the survivors — same output as ``decontaminate``, different scale
    shape.

    Why: the exact path broadcasts every distinct eval gram (GBs once
    the held-out suite reaches tens of millions of grams). The Bloom
    bitmap is ~10 bits/gram at 1% fpp — MBs — so the 100 TB training
    side still never shuffles, and the exact verification join runs on
    the bloom survivors only (true hits + ~fpp of the stream) against
    the eval grams, both tiny relative to the corpus.

    The whole path is JVM-side end-to-end (guide §4 — no Python
    boundary): grams hash with ``xxhash64`` twice (Kirsch–Mitzenmacher
    double hashing, overflow-safe: both hashes reduce ``pmod m``
    BEFORE the linear combination — ANSI mode would reject a wrapping
    multiply), positions explode → ``(word, bit)`` → ``bit_or``
    aggregate, and the ~m/64 packed words assemble into ONE
    ``array<bigint>`` row that rides a broadcast join onto the
    training gram stream; the k-probe membership test is k
    ``element_at``/``shiftright`` terms inside whole-stage codegen.
    (Round 10 shipped the bitmap to a numpy broadcast and tested
    membership in an Arrow-batched pandas UDF — 4 ``ArrowEvalPython``
    nodes and a ``toPandas`` collect job; round 11 moved both into
    the JVM with a bit-identical bitmap, so even the realized false
    positives are unchanged.)

    ``verify=False`` returns bloom-only hits (may overcount by ~fpp;
    never undercounts — no false negatives) for pure-prefilter use.
    """

    def grams_of(d):
        base = spread(
            d.select(
                F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks")
            )
        )
        return base.select(
            "_id", F.explode(_token_ngrams(F.col("_toks"), n)).alias("gram")
        )

    # The distinct eval-gram frame feeds THREE consumers: the sizing
    # count, the bitmap build, and (verify=True) the exact survivor
    # join in the returned plan. localCheckpoint materializes the
    # featurize ONCE and all three read the stored rows — a persist()
    # released before return (the old shape) made the verify join
    # re-derive the whole lineage a second time (guide §1.2/§5), and
    # an unreleased persist would pin the session CacheManager.
    test_grams = (
        grams_of(test).select("gram").distinct().localCheckpoint(eager=True)
    )
    n_items = test_grams.count()
    m, k = _bloom_params(n_items, fpp)

    h1 = F.pmod(F.xxhash64(F.col("gram")), F.lit(m))
    h2 = F.pmod(F.xxhash64(F.col("gram"), F.lit(1)), F.lit(m))
    pos = F.explode(
        F.array(*[(h1 + F.lit(i) * h2) % F.lit(m) for i in range(k)])
    ).alias("pos")
    words = (
        test_grams.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 64 as int))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    # Dense bitmap as ONE array<bigint> row: set words -> map, then a
    # zero-filled sequence lookup. The frame stays in the JVM and its
    # build runs inside the main query's broadcast exchange — no
    # toPandas collect job, no Python-side broadcast.
    bitmap = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("_m")
    ).select(
        F.expr(
            f"transform(sequence(0, {m // 64 - 1}), "
            "w -> coalesce(_m[cast(w as bigint)], cast(0 as bigint)))"
        ).alias("_bm")
    )

    # k membership probes in whole-stage codegen; h1/h2 are already in
    # [0, m) so the linear combination cannot wrap (ANSI-safe).
    def _probe_term(i: int) -> str:
        p = f"((_h1 + {i} * _h2) % {m})"
        return (
            f"((shiftright(element_at(_bm, cast({p} DIV 64 AS INT) + 1), "
            f"cast({p} % 64 AS INT)) & 1) = 1)"
        )

    might_contain = F.expr(" AND ".join(_probe_term(i) for i in range(k)))

    tg = grams_of(train).select(
        "_id",
        "gram",
        F.pmod(F.xxhash64(F.col("gram")), F.lit(m)).alias("_h1"),
        F.pmod(F.xxhash64(F.col("gram"), F.lit(1)), F.lit(m)).alias("_h2"),
    )
    survivors = (
        tg.join(F.broadcast(bitmap))
        .where(might_contain)
        .select("_id", "gram")
    )
    if verify:
        survivors = survivors.join(test_grams, "gram")
    return (
        survivors.groupBy("_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= min_shared)
        .select(F.col("_id").alias(id_col), "n_shared_grams")
    )


def decontaminate_clean(
    train: DataFrame, test: DataFrame, n: int = 5, min_shared: int = 1, **kw
) -> DataFrame:
    """Training set minus contaminated documents (left-anti join)."""
    flagged = decontaminate(train, test, n=n, min_shared=min_shared, **kw)
    id_col = kw.get("id_col", "doc_id")
    return train.join(flagged.select(id_col), id_col, "left_anti")


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Offset-based token packing: concatenate each shard's documents
    in deterministic (``id``) order and chunk the token stream into
    fixed ``budget``-token packs; report each document's pack and
    offset (concat-then-chunk training layout — documents may straddle
    pack boundaries, as in standard pretraining batch prep).

    ``pack_id = floor(start_offset / budget)`` with ``start_offset``
    the running token count before the document — a prefix sum, i.e.
    one window per shard, no driver state. Shards are independent
    (partitioned prefix sums), which is what makes this scale: the
    100 TB layout runs one window per shard partition, never a global
    single-partition sort.
    """
    # long, not int: keeps the column width identical to SQL engines'
    # len() (BIGINT) so differential hashes see the same dtype.
    n_tok = F.size(ws_tokens(F.col(text_col))).cast("long")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return (
        df.select(shard_col, id_col, n_tok.alias("n_tok"))
        .select(
            shard_col,
            id_col,
            "n_tok",
            F.floor((cum - F.col("n_tok")) / budget).alias("pack_id"),
            ((cum - F.col("n_tok")) % budget).alias("pack_offset"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token stream into windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens − overlap``
    (context-window preparation for embedding / RAG indexing; the
    per-document twin of ``pack_sequences``' cross-document layout).

    Output: ``(id, chunk_id, chunk_start, chunk_len, chunk_text)`` —
    one row per chunk, last chunk may be short; a document shorter
    than one chunk yields exactly one chunk. A tail chunk that would
    be wholly contained in its predecessor (every token already
    emitted) is not produced.

    Purely narrow: tokenize → ``sequence`` of starts → ``posexplode``
    → ``slice``/``array_join`` — no shuffle, no window, scales with
    input partitions and parallelizes per document.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks")
    )
    # A tail start s (> 0) whose chunk [s, s+chunk) would be wholly
    # contained in its predecessor [s-stride, s-stride+chunk) is
    # dropped: that happens exactly when the predecessor already
    # reaches the end of the document, i.e. s + overlap >= n_tokens.
    starts = F.filter(
        F.sequence(
            F.lit(0),
            F.greatest(F.size("_toks") - 1, F.lit(0)),
            F.lit(stride),
        ),
        lambda s: (s == 0) | (s + overlap < F.size("_toks")),
    )
    chunks = base.select(
        "_id", "_toks", F.posexplode(starts).alias("chunk_id", "chunk_start")
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_start") + 1, chunk_tokens)
    # long, not int: dtype parity with SQL engines (len()/range are
    # BIGINT there) so differential hashes see identical column widths.
    return chunks.select(
        F.col("_id").alias(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("chunk_len"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def dedup_spans(
    df: DataFrame,
    span_tokens: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact span dedup (C4-style "remove duplicated
    spans"): tile each document's token stream into non-overlapping
    ``span_tokens``-token spans, keep only the globally FIRST
    occurrence of each distinct span (ordered by ``(doc_id, span_id)``),
    and reassemble each document from its surviving spans.

    Output: ``(id, n_spans, n_kept, deduped_text)`` — one row per input
    document; a document whose every span occurred earlier elsewhere
    survives with ``n_kept = 0`` and empty text.

    Plan shape (two keyed shuffles, no windows, no join-back):

    - tile → explode is purely narrow;
    - keeper selection is ONE ``groupBy(span_text).agg(min(struct(id,
      span_id)))`` — map-side partial aggregation collapses hot
      boilerplate spans (the exact skew this operator hunts) to one row
      per input partition BEFORE the exchange, and the aggregate's
      output IS the kept-span set, so no second pass over the span
      stream joins keepers back;
    - reassembly is one ``groupBy(id)`` collecting ``(span_id, text)``
      structs, sorted in-array (``array_sort`` — no window, no global
      sort).

    At 100 TB the span stream shuffles once on ``span_text`` (size
    bounded by DISTINCT spans after map-side collapse) and once on
    ``id`` (bounded by kept spans); both keys are high-cardinality, and
    AQE splits any residual skew.
    """
    base = spread(
        df.select(
            F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks")
        )
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("_toks") - 1, F.lit(0)),
        F.lit(span_tokens),
    )
    spans = base.select(
        "_id", "_toks", F.posexplode(starts).alias("span_id", "_start")
    ).select(
        "_id",
        F.col("span_id").cast("long").alias("span_id"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("_start") + 1, span_tokens), " "
        ).alias("span_text"),
    )
    # min(struct) = lexicographic (id, span_id) — the first occurrence.
    kept = (
        spans.groupBy("span_text")
        .agg(F.min(F.struct(F.col("_id"), F.col("span_id"))).alias("_k"))
        .select(
            F.col("_k._id").alias("_id"),
            F.col("_k.span_id").alias("span_id"),
            "span_text",
        )
    )
    # n_spans is size(starts) per input row — computing it on the
    # narrow base avoids re-running the tile+explode a second time
    # (the sum over duplicate ids matches the old count over exploded
    # rows exactly; posexplode of the always-nonempty sequence never
    # drops a row).
    per_doc = (
        base.select("_id", F.size(starts).cast("long").alias("_ns"))
        .groupBy("_id")
        .agg(F.sum("_ns").alias("n_spans"))
    )
    rebuilt = kept.groupBy("_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_id", "span_text"))),
                lambda x: x["span_text"],
            ),
            " ",
        ).alias("deduped_text"),
    )
    return (
        per_doc.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_spans",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("deduped_text"), F.lit("")).alias("deduped_text"),
        )
    )


#: Redaction patterns — RE2-safe (no lookaround), portable verbatim to
#: DuckDB. Whitespace is the explicit ``[ \t\n\r\f\x0B]`` class, never
#: ``\s``, so Java (Spark) and RE2 (DuckDB) agree byte-for-byte. The
#: phone pattern anchors ``\b`` on the first digit — ``\b\+?`` would
#: require a word character *before* the '+', rejecting "+49..." at
#: line starts and after spaces.
REDACT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?\b[0-9][0-9()\- \t\n\r\f\x0B]{7,}[0-9]\b",
}


def redact_pii(
    df: DataFrame,
    patterns: dict[str, str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scrub PII-shaped spans (emails / IPv4 / phone-ish runs) and
    account per-document substitution counts — the redaction pass every
    shared-corpus pipeline runs before training.

    Output: ``(id, redacted_text, n_<kind>...)``. Pure projection
    (``regexp_count`` + chained ``regexp_replace``), zero shuffle;
    patterns are RE2-class so a DuckDB oracle replays them verbatim.
    Replacement token is ``<kind>`` (e.g. ``<email>``), applied in
    sorted-kind order so engines agree on overlapping matches.

    ``n_<kind>`` counts matches against the text *as that kind's pass
    sees it* (i.e. after earlier kinds' replacements) — exactly the
    number of substitutions performed, not the pre-redaction match
    count, which would double-book spans an earlier kind consumed.

    An explicitly empty ``patterns={}`` means "redact nothing" and
    returns the text unchanged; only ``None`` selects the defaults.
    """
    patterns = REDACT_PATTERNS if patterns is None else patterns
    out = F.col(text_col)
    counts = []
    for kind in sorted(patterns):
        pat = patterns[kind]
        counts.append(
            F.regexp_count(out, F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        out = F.regexp_replace(out, pat, f"<{kind}>")
    return df.select(F.col(id_col), out.alias("redacted_text"), *counts)


def mixture_plan(
    docs: DataFrame,
    by: str = "lang",
    alpha: float = 0.5,
    token_budget: int = 1_000_000,
    text_col: str = "text",
) -> DataFrame:
    """X7: temperature-scaled data-mixture planning — the standard
    multilingual/source rebalancing rule: group weight ∝ n_tokens^α
    (α<1 upsamples the tail relative to proportional sampling), then a
    per-group keep fraction sized so the planned corpus hits
    ``token_budget`` tokens.

    Plan shape: ONE two-phase hash agg over the corpus (per-group token
    sums; map-side partials shrink each partition to one row per group)
    then arithmetic over the group-level rows — at 100 TB the only
    thing that scales with data is the one aggregation. α is fixed at
    the sqrt family when 0.5 (``sqrt`` is IEEE-correctly-rounded on
    every engine, unlike ``pow``, so the plan is engine-portable;
    other α values use ``pow`` and stay deterministic within one
    engine).

    Returns (group, n_docs, n_tokens, weight, keep_fraction,
    planned_tokens); fractions are rounded to 6 d.p. BEFORE use so a
    replay on another engine derives identical keep decisions.
    """
    stats = docs.groupBy(F.col(by).alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(ws_tokens(F.col(text_col))).cast("long")).alias("n_tokens"),
    )
    scaled = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    w = Window.partitionBy()  # group-level rows only: single tiny partition
    weight = F.round(scaled / F.sum(scaled).over(w), 6)
    planned = F.floor(weight * F.lit(float(token_budget))).cast("long")
    keep = F.round(
        F.least(F.lit(1.0), planned / F.col("n_tokens").cast("double")), 6
    )
    return stats.select(
        F.col("grp").alias(by),
        "n_docs",
        "n_tokens",
        weight.alias("weight"),
        keep.alias("keep_fraction"),
        planned.alias("planned_tokens"),
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    by: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic application of a mixture plan: keep each doc iff
    its content-stable hash bucket falls below the group's (rounded)
    keep fraction — reproducible across runs, engines, and partial
    reprocessing, zero shuffle on the corpus side (the plan broadcasts;
    the filter is scan-side codegen)."""
    from .sampling import BUCKETS, hash_bucket

    p = plan.select(by, "keep_fraction")
    return (
        docs.join(F.broadcast(p), by)
        .where(
            hash_bucket(F.col(id_col))
            < F.floor(F.col("keep_fraction") * BUCKETS).cast("bigint")
        )
        .drop("keep_fraction")
    )


def decontaminate_fuzzy(
    train: DataFrame,
    eval_df: DataFrame,
    min_jaccard: float = 0.5,
    num_hashes: int = 32,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    portable_hash: bool = True,
    refine: str = "estimate",
) -> DataFrame:
    """NEAR-duplicate train/eval decontamination (the fuzzy sibling of
    the exact-n-gram ``decontaminate``): flags training documents
    whose MinHash-estimated jaccard against ANY eval document reaches
    ``min_jaccard`` — paraphrased or lightly-edited leakage that exact
    gram matching misses.

    Scale shape: signatures for both corpora (the 100 TB side never
    self-joins), band keys via the SAME LSH bucketing as dedup, and a
    BIPARTITE band join with the eval side broadcast (eval sets are
    benchmark-sized); the candidate set (bounded by eval band matches)
    then BROADCASTS back onto the train signature table, so the
    refinement is a map-side probe — no shuffle of train signatures
    to serve a handful of pairs. The train signature subtree is
    referenced by both the banding and refinement branches; Catalyst's
    ReuseExchange normally dedups it, but at production scale persist
    or checkpoint ``sig_t`` explicitly if one-signature-pass must be
    guaranteed. Returns (id, eval_id, jaccard_est) at/above threshold;
    anti-join it against ``train`` to drop flagged docs.

    ``refine="exact"`` verifies each candidate against the TRUE
    shingle sets instead of the signature agreement rate — the
    ``lsh_near_dup_pairs_exact`` contract for the bipartite case. The
    output column keeps the name ``jaccard_est`` for schema stability,
    but its value is then the exact n-gram Jaccard; use it when the
    decontamination bar must mean what it says (the 32-hash estimate
    carries a ±0.02-0.04 corpus-level luck draw — dedup.minhash_params
    has the measurement record — and a decontamination FALSE NEGATIVE
    is an eval-set leak).

    Blind-spot guard: documents whose NORMALIZED text is shorter than
    ``shingle_k`` produce no shingles and therefore no signature (the
    same contract as every minhash consumer) — such eval docs are
    matched by EXACT normalized-text equality instead (flagged at
    jaccard_est 1.0), so a byte-identical copy of a short eval doc
    can't slip through silently.
    """
    from ..functions import norm_text
    from .dedup import (
        SIG_AGREEMENT_EXPR,
        band_key_frame,
        minhash_signature_arrays,
    )

    sig_t = minhash_signature_arrays(
        train, id_col, text_col, num_hashes=num_hashes,
        shingle_k=shingle_k, portable_hash=portable_hash,
    )
    sig_e = minhash_signature_arrays(
        eval_df, eval_id_col, eval_text_col, num_hashes=num_hashes,
        shingle_k=shingle_k, portable_hash=portable_hash,
    )
    bt = band_key_frame(sig_t, id_col, rows_per_band)
    be = band_key_frame(sig_e, eval_id_col, rows_per_band)
    cand = (
        bt.join(F.broadcast(be), ["band", "band_hash"])
        .select(id_col, eval_id_col)
        .distinct()
    )
    if refine == "exact":
        def _sets(df_, idc, tc):
            from .dedup import shingle_set_expr

            t = norm_text(F.col(tc))
            arr = shingle_set_expr(shingle_k, sort=True)
            return (
                df_.select(F.col(idc), t.alias("_t"))
                .where(F.length("_t") >= shingle_k)
                .select(idc, arr.alias("_sh"))
            )

        st = _sets(train, id_col, text_col).withColumnRenamed("_sh", "_sa")
        se = _sets(eval_df, eval_id_col, eval_text_col).withColumnRenamed(
            "_sh", "_sb"
        )
        inter = F.size(F.array_intersect("_sa", "_sb"))
        uni = F.size("_sa") + F.size("_sb") - inter
        est = (
            st.join(F.broadcast(cand), id_col)
            .join(F.broadcast(se), eval_id_col)
            .select(
                id_col, eval_id_col, (inter / uni).alias("jaccard_est")
            )
        )
    else:
        est = (
            sig_t.select(F.col(id_col), F.col("sig").alias("sig_a"))
            .join(F.broadcast(cand), id_col)
            .join(
                F.broadcast(
                    sig_e.select(F.col(eval_id_col), F.col("sig").alias("sig_b"))
                ),
                eval_id_col,
            )
            .select(
                id_col,
                eval_id_col,
                (F.expr(SIG_AGREEMENT_EXPR) / F.lit(num_hashes)).alias(
                    "jaccard_est"
                ),
            )
        )
    flagged = est.where(F.col("jaccard_est") >= min_jaccard)

    # exact-equality fallback for signature-less short eval docs
    short_e = eval_df.select(
        F.col(eval_id_col), norm_text(F.col(eval_text_col)).alias("_nt")
    ).where(F.length("_nt") < shingle_k)
    exact_hits = (
        train.select(F.col(id_col), norm_text(F.col(text_col)).alias("_nt"))
        .join(F.broadcast(short_e), "_nt")
        .select(id_col, eval_id_col, F.lit(1.0).alias("jaccard_est"))
    )
    return flagged.unionByName(exact_hits)


def calibrate_scores(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-source score calibration: raw quality signals from
    different sources live on incomparable scales (a web-crawl
    heuristic vs a books-corpus heuristic), so mixture planning and
    quota filters must never compare them directly. Appends two
    calibrated forms, both computed WITHIN the group:

    - ``cal_rank``: percent_rank over (score, id) — a strict total
      order, so ties break deterministically and the rank is uniform
      on [0, 1] per source regardless of the raw scale;
    - ``cal_z``: (score - mean) / std via the explicit population
      moment formula sqrt(max(E[x^2] - E[x]^2, 0)) — NULL for
      degenerate groups (zero variance), never a division blow-up.

    Scale posture: the rank is one window pass hash-partitioned by
    source; the moments are a |sources|-row aggregate broadcast back.
    Both calibrated columns are then directly comparable across
    sources, which is what the mixture planner consumes.
    """
    w = Window.partitionBy(group_col).orderBy(score_col, id_col)
    m = df.groupBy(group_col).agg(
        F.count(score_col).alias("_n"),
        F.sum(score_col).alias("_s"),
        F.sum(F.col(score_col) * F.col(score_col)).alias("_ss"),
    )
    mean = F.col("_s") / F.col("_n")
    var = F.greatest(F.col("_ss") / F.col("_n") - mean * mean, F.lit(0.0))
    return (
        df.join(F.broadcast(m), group_col)
        .withColumn("cal_rank", F.percent_rank().over(w))
        .withColumn(
            "cal_z",
            F.when(
                var > 0, (F.col(score_col) - mean) / F.sqrt(var)
            ),
        )
        .drop("_n", "_s", "_ss")
    )


#: Gopher stop words (Rae et al. 2021 §A1.1: "the, be, to, of, and,
#: that, have, with" — a doc must contain at least 2).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The published Gopher quality-filter rule bundle (Rae et al.
    2021, "Scaling Language Models", §A1.1) as ONE scan-side
    projection — the standard pre-classifier curation stage: word
    count in [50, 100k], mean word length in [3, 10], symbol-to-word
    ratio (# or …) <= 0.1, <= 90% of lines starting with a bullet,
    <= 30% ending with an ellipsis, >= 80% of words containing an
    alphabetic character, and >= 2 Gopher stop words. SURVEY.md §2.10
    extended surface — net-new.

    Output: per-doc exact counters (``n_words``, ``n_symbols``,
    ``n_bullet_lines``, ``n_ellipsis_lines``, ``n_lines``,
    ``n_alpha_words``, ``n_stopwords`` — all BIGINT), floor-quantized
    micro-unit ratios (``*_e6`` — single IEEE div/mul chains from
    exact integers, hash-gateable), one boolean per rule, and the
    conjunction ``passes``. Thresholds are compile-time literals, so
    rule booleans replay exactly cross-engine.

    Plan shape: one projection over the scan — token/line arrays are
    materialized columns (the ``_token_ngrams`` lesson: a lambda that
    re-runs the tokenizer per element is O(len²)), every counter is a
    size/filter over them, no shuffle, no join, no explode. At 100 TB
    this codegens into the scan stage like any other row filter.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda ln: F.length(F.trim(ln)) > 0,
    )
    base = spread(df.select(F.col(id_col), F.col(text_col))).select(
        id_col,
        ws_tokens(F.col(text_col)).alias("_toks"),
        lines.alias("_lines"),
    )
    n_words = F.size("_toks")
    # symbols: '#' or the three-dot / unicode ellipsis, counted per
    # occurrence across the doc (Gopher counts symbol-to-WORD ratio)
    n_symbols = (
        F.size(F.split(F.concat_ws(" ", "_toks"), "#")) - 1
        + F.size(F.split(F.concat_ws(" ", "_toks"), r"\.\.\.")) - 1
        + F.size(F.split(F.concat_ws(" ", "_toks"), "…")) - 1
    )
    n_bullets = F.size(
        F.filter("_lines", lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    # \z, not $: Java's bare $ also matches before a final line
    # terminator (a trailing \r from CRLF input), while the oracle's
    # RE2 $ is end-of-text — the quality.py:expect_matches \A..\z
    # doctrine applies to every cross-engine anchored regex.
    n_ellipsis = F.size(
        F.filter(
            "_lines",
            lambda ln: F.trim(ln).rlike("(\\.\\.\\.|…)\\z"),
        )
    )
    n_lines = F.size("_lines")
    # \p{L}, not [a-z]: the published rule is "contains an alphabetic
    # character" — an ASCII-only class would reject every non-English
    # document wholesale (é/ü/Cyrillic/CJK all count). Both Java and
    # RE2 support the Unicode letter class with identical semantics.
    n_alpha = F.size(F.filter("_toks", lambda w: w.rlike(r"\p{L}")))
    # array_intersect already de-duplicates; counting against the
    # 8-element stopword array yields distinct stopword TYPES present.
    n_stop = F.size(
        F.array_intersect(
            F.col("_toks"),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    mean_wlen = F.length(F.concat_ws("", "_toks")) / F.greatest(
        n_words, F.lit(1)
    )

    def e6(num, den):
        return F.floor(
            num.cast("double") / F.greatest(den, F.lit(1)).cast("double")
            * F.lit(1_000_000.0)
        ).cast("long")

    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wlen >= min_mean_word_len)
        & (mean_wlen <= max_mean_word_len),
        "rule_symbol_ratio": n_symbols
        <= F.lit(float(max_symbol_ratio)) * n_words,
        "rule_bullets": n_bullets
        <= F.lit(float(max_bullet_frac)) * F.greatest(n_lines, F.lit(1)),
        "rule_ellipsis": n_ellipsis
        <= F.lit(float(max_ellipsis_frac)) * F.greatest(n_lines, F.lit(1)),
        "rule_alpha": n_alpha >= F.lit(float(min_alpha_frac)) * n_words,
        "rule_stopwords": n_stop >= min_stopwords,
    }
    passes = None
    for cond in rules.values():
        passes = cond if passes is None else passes & cond
    return base.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        n_symbols.cast("long").alias("n_symbols"),
        n_bullets.cast("long").alias("n_bullet_lines"),
        n_ellipsis.cast("long").alias("n_ellipsis_lines"),
        n_lines.cast("long").alias("n_lines"),
        n_alpha.cast("long").alias("n_alpha_words"),
        n_stop.cast("long").alias("n_stopwords"),
        e6(F.length(F.concat_ws("", "_toks")), n_words).alias("mean_wlen_e6"),
        e6(n_symbols, n_words).alias("symbol_ratio_e6"),
        e6(n_alpha, n_words).alias("alpha_frac_e6"),
        *[cond.alias(name) for name, cond in rules.items()],
        passes.alias("passes"),
    )
