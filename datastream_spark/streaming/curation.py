"""Streaming curation: live-ingest twins of the batch corpus-curation
operators (SURVEY.md §2.10 X7).

The stateless operators (quality scoring, redaction, chunking,
weighted sampling) need no twin — the batch expressions run unchanged
on a readStream (tested in test_streaming.py). This module covers the
one curation operator whose batch shape involves a join:
decontamination of a LIVE document feed against a static held-out set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spread, ws_tokens
from ..operators.curation import _token_ngrams

__all__ = ["streaming_decontaminate"]


def streaming_decontaminate(
    stream: DataFrame,
    test: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag streamed training documents sharing token ``n``-grams with
    a static evaluation set, as they arrive.

    Same plan discipline as the batch ``decontaminate``: the eval side
    dedups to distinct grams once (static) and BROADCASTS; the stream
    explodes its raw grams into that broadcast join, so the only rows
    that ever reach stateful processing are the hits — rare by
    construction. State = one row per distinct (doc, shared-gram) hit
    pair (the dedup before counting), NOT per streamed gram, so state
    size tracks contamination volume rather than feed volume.

    Returns a streaming frame ``(id, n_shared_grams)`` — an
    aggregation, so run it in ``complete`` (bounded hit set) or
    ``update`` output mode; batch-parity is pinned by
    ``test_streaming_decontaminate_matches_batch``.
    """
    test_base = test.select(
        F.col(id_col).alias("_tid"), ws_tokens(F.col(text_col)).alias("_toks")
    )
    test_grams = (
        spread(test_base)
        .select(F.explode(_token_ngrams(F.col("_toks"), n)).alias("gram"))
        .distinct()
    )
    stream_grams = stream.select(
        F.col(id_col).alias("_id"), ws_tokens(F.col(text_col)).alias("_toks")
    ).select("_id", F.explode(_token_ngrams(F.col("_toks"), n)).alias("gram"))
    hits = stream_grams.join(F.broadcast(test_grams), "gram")
    return (
        hits.dropDuplicates(["_id", "gram"])
        .groupBy("_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .select(F.col("_id").alias(id_col), "n_shared_grams")
    )
