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


def prepare_corpus_full(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    lm_reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.02,
    max_dup_token_frac: float = 0.9,
    min_lm_score: float | None = None,
    decontam_n: int = 8,
    chunk_chars: int = 200,
    html_col: str | None = None,
) -> DataFrame:
    """The whole pre-training prep recipe in one composition, every stage
    from this package: PII scrub → repetition filter → quality filter +
    exact dedup (:func:`prepare_corpus`-style) → optional train/test
    decontamination against ``benchmark`` → optional LM perplexity filter
    against ``lm_reference`` → chunking.

    Stage order matters: scrubbing precedes hashing (so dedup keys reflect
    the text that ships), decontamination runs before chunking (benchmark
    n-grams span chunk boundaries), and every map-side stage (scrub,
    repetition, quality) runs before the first shuffle so the corpus is
    smallest when it first crosses the wire.

    ``html_col``: when given, the pipeline starts one stage EARLIER — at
    raw crawl HTML: ``htmltext.html_extract`` strips boilerplate and the
    extracted main text feeds the chain as ``text_col`` (another
    map-side, pre-shuffle stage, so the raw markup never crosses the
    wire either)."""
    from otit_swt_spark.pipelines.decontam import decontaminate
    from otit_swt_spark.pipelines.lm_quality import lm_filter, train_char_lm
    from otit_swt_spark.pipelines.pii import scrub_pii
    from otit_swt_spark.pipelines.textstats import repetition_stats

    if html_col is not None:
        from otit_swt_spark.pipelines.htmltext import html_extract

        docs = (html_extract(docs, html_col=html_col, id_col=id_col)
                .select(id_col, F.col("text").alias(text_col)))
    scrubbed = scrub_pii(docs.select(id_col, text_col), text_col=text_col)
    low_rep = (repetition_stats(scrubbed, text_col=text_col)
               .filter(F.col("rep_dup_token_frac") <= max_dup_token_frac)
               .select(id_col, text_col))
    if benchmark is not None:
        low_rep = decontaminate(low_rep, benchmark, n=decontam_n,
                                text_col=text_col, id_col=id_col,
                                keep_flagged=False)
    if lm_reference is not None:
        model = train_char_lm(lm_reference, n=3, text_col=text_col)
        floor = min_lm_score if min_lm_score is not None else -3.2
        low_rep = lm_filter(low_rep, model, n=3, text_col=text_col,
                            id_col=id_col, min_score=floor)
    return prepare_corpus(low_rep, text_col=text_col, id_col=id_col,
                          min_tokens=min_tokens,
                          min_stopword_ratio=min_stopword_ratio,
                          chunk_chars=chunk_chars)
