"""Streaming document dedup — the training-data pipeline ops, stream form.

Scale design:
- **Exact dedup** is ``dropDuplicatesWithinWatermark`` on a content digest:
  state-store keys are 16-byte digests, evicted at the watermark horizon,
  so state is bounded by (ingest rate x horizon), never stream length.
- **Near-dup flagging** is a STREAM-STATIC join: the micro-batch's MinHash
  band entries (map-side explode, no stream-side shuffle) probe a static
  LSH index of the reference corpus. The static side is broadcast or
  bucket-joined by Catalyst per micro-batch; new corpus snapshots swap in
  by restarting the query against the refreshed index path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from otit_swt_spark.pipelines.dedup import band_entries_for, minhash_signature_udf


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact-content duplicates within the watermark horizon.

    Emits the first arrival of each distinct content digest; later copies
    inside the horizon are suppressed by the state store, copies arriving
    after the horizon re-emit (bounded state is the price of unbounded
    streams — a nightly batch ``exact_dedup`` pass over the sink removes
    the stragglers)."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(event_time, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def build_lsh_index(corpus: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 64,
                    bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """Static LSH band index of a reference corpus: (id, band, bucket).
    Write it to parquet partitioned by ``band`` for pruned probes."""
    sig = minhash_signature_udf(k, shingle_n)(F.col(text_col))
    with_sig = corpus.select(F.col(id_col).alias("id"), sig.alias("sig"))
    return band_entries_for(with_sig, k, bands)


def stream_near_dup_flags(
    stream_docs: DataFrame,
    static_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    event_time: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Flag streaming documents that LSH-collide with a static reference
    corpus. Streaming input yields append-safe (doc_id, corpus_id) hit
    pairs (stream-static inner join — no stream-side aggregation state;
    duplicate hit pairs are suppressed by ``dropDuplicatesWithinWatermark``
    so the dedup state store is evicted at the watermark horizon, keeping
    state bounded by ingest rate x horizon); batch input additionally
    aggregates to (doc_id, n_hits)."""
    sig = minhash_signature_udf(k, shingle_n)(F.col(text_col))
    streaming = stream_docs.isStreaming
    if streaming and event_time not in stream_docs.columns:
        # No event-time column: fall back to a processing-time watermark so
        # the pair-dedup state store still gets evicted.
        stream_docs = stream_docs.withColumn(event_time, F.current_timestamp())
    carry = (event_time,) if streaming else ()
    with_sig = stream_docs.select(
        F.col(id_col).alias("id"), *carry, sig.alias("sig"))
    probes = band_entries_for(with_sig, k, bands, extra=carry)
    idx = static_index.select(
        F.col("id").alias("corpus_id"), "band", "bucket")
    hits = (
        probes.join(idx, ["band", "bucket"])
        .select(F.col("id").alias(id_col), *carry, "corpus_id")
    )
    if streaming:
        return (hits.withWatermark(event_time, watermark)
                .dropDuplicatesWithinWatermark([id_col, "corpus_id"]))
    return (hits.dropDuplicates([id_col, "corpus_id"])
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits")))


def build_phash_index(corpus_hashes: DataFrame,
                      id_col: str = "media_id",
                      fp_col: str = "ahash") -> DataFrame:
    """Static banded index of a reference corpus' 64-bit perceptual
    fingerprints (image aHash, audio envelope hash, video clip hash —
    any ``dedup.hamming_banded_pairs``-compatible frame):
    ``(corpus_id, chunk, key, corpus_fp)``, one row per 16-bit chunk.
    The media twin of :func:`build_lsh_index`; write it partitioned by
    ``chunk`` for pruned probes. NULL fingerprints (undecodable media)
    never enter the index."""
    from otit_swt_spark.pipelines.dedup import chunk_entries_for

    return (chunk_entries_for(corpus_hashes, id_col, fp_col)
            .select(F.col("id").alias("corpus_id"),
                    F.col("sh").alias("corpus_fp"), "chunk", "key"))


def stream_phash_neardup_flags(
    stream_hashes: DataFrame,
    static_index: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "ahash",
    max_distance: int = 3,
    event_time: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Flag streaming media whose perceptual fingerprint lands within
    ``max_distance`` Hamming bits of a static reference corpus — the
    media twin of :func:`stream_near_dup_flags`, and the streaming
    counterpart of ``dedup.hamming_banded_pairs``: probe the banded
    chunk index (pigeonhole recall guarantee for distance <= 3), then
    verify by exact Hamming. The stream side is one stateless
    stream-static inner join + a codegen'd bit_count filter; the only
    state is the (id, corpus_id) pair dedup (a pair can hit via
    several chunks), evicted at the watermark horizon. Batch input
    instead dedups exactly and keeps the verified distance. Output:
    ``(id_col, corpus_id, hamming)`` for batch;
    ``(id_col, event_time, corpus_id)`` pairs for streams."""
    from otit_swt_spark.pipelines.dedup import chunk_entries_for, hamming64

    if max_distance > 3:
        # the 4x16-bit pigeonhole only GUARANTEES recall for distance
        # <= 3; beyond that a pair can differ in every chunk and never
        # probe the index — fail fast instead of silently losing matches
        raise ValueError(
            "stream_phash_neardup_flags guarantees recall only for "
            f"max_distance <= 3 (got {max_distance})")
    streaming = stream_hashes.isStreaming
    if streaming and event_time not in stream_hashes.columns:
        stream_hashes = stream_hashes.withColumn(
            event_time, F.current_timestamp())
    carry = (event_time,) if streaming else ()
    chunks = (chunk_entries_for(stream_hashes, id_col, fp_col,
                                extra=carry)
              .select(F.col("id").alias("__pid"), *carry,
                      F.col("sh").alias("__pfp"), "chunk", "key"))
    hits = (chunks.join(static_index, ["chunk", "key"])
            .withColumn("__ham", hamming64(F.col("__pfp"),
                                           F.col("corpus_fp")))
            .where(F.col("__ham") <= max_distance)
            .where(F.col("__pid") != F.col("corpus_id")))
    if streaming:
        return (hits.select(F.col("__pid").alias(id_col), *carry,
                            "corpus_id")
                .withWatermark(event_time, watermark)
                .dropDuplicatesWithinWatermark([id_col, "corpus_id"]))
    return (hits.select(F.col("__pid").alias(id_col), "corpus_id",
                        F.col("__ham").alias("hamming"))
            .dropDuplicates([id_col, "corpus_id"]))
