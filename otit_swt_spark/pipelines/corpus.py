"""End-to-end training-corpus preparation: the composite pipeline a
pre-training data job runs — filter by text quality, drop exact duplicates,
chunk to a context budget, count tokens per chunk.

Scale design: the quality filter and chunker are map-side (pure built-ins,
codegen'd); exact dedup shuffles only (digest, id) pairs and rejoins as a
LEFT SEMI on id, so full document text crosses the wire exactly once (into
the chunk write). Near-dup removal composes in front via
``pipelines.dedup.near_dedup`` when the corpus needs it — kept out of this
composite so the deterministic stages stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from otit_swt_spark.pipelines.textstats import chunk_text, n_tokens, stopword_ratio


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.02,
    chunk_chars: int = 200,
) -> DataFrame:
    """documents -> (doc_id, chunk_idx, chunk, n_tokens) training chunks.

    Keeps documents with at least ``min_tokens`` whitespace tokens and a
    stopword ratio at or above ``min_stopword_ratio`` (prose-ness), keeps
    the minimum id per exact content digest, then chunks to
    ``chunk_chars``-character windows."""
    t = F.col(text_col)
    kept = docs.filter((n_tokens(t) >= min_tokens)
                       & (stopword_ratio(t) >= min_stopword_ratio))
    keep_ids = (
        kept.select(F.col(id_col), F.md5(t).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = kept.join(keep_ids, id_col, "left_semi")
    chunks = chunk_text(deduped, chunk_chars=chunk_chars,
                        text_col=text_col, id_col=id_col)
    return chunks.select(
        id_col, "chunk_idx", "chunk",
        n_tokens(F.col("chunk")).alias("n_tokens"),
    )
