"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- exact dedup is a single hash-shuffle on a 16-byte digest (not the text);
- MinHash signatures are computed map-side with built-in functions
  (md5-prefix shingle hashes, k linear permutations), so the only shuffle
  is the band-bucket groupBy, whose keys are uniformly distributed;
- candidate pair generation joins within LSH buckets only (no all-pairs);
- verification (exact n-gram Jaccard) runs on the candidate pairs, which is
  orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

MERSENNE = (1 << 61) - 1

# The ASCII whitespace class of Java/RE2 ``\s`` — the split the
# expression form (F.split(..., r"\s+")) and every DuckDB oracle
# (string_split_regex(..., '\s+')) perform. Python ``str.split()`` with
# no argument splits on *Unicode* whitespace (U+00A0, U+2028, ...) and
# would silently diverge from those forms on non-ASCII corpora — the
# r13-advice parity gap.
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _ws_tokens(t: str | None) -> list[str]:
    """Lowercased ASCII-whitespace tokens with empty tokens dropped —
    the exact token stream of the oracle's
    ``list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')``.
    ``None`` tokenizes like the empty string (no tokens), so each UDF's
    short-text fallback emits the same ``""`` whole-doc gram the
    oracle's ``coalesce(..., '')`` produces."""
    return [w for w in _ASCII_WS.split((t or "").lower()) if w]


def _md5_31(s: Column) -> Column:
    """31-bit shingle hash: int(md5_hex[:8], 16) & 0x7fffffff.

    Chosen over crc32/xxhash64 deliberately: every SQL engine reproduces
    the md5 hex prefix bit-for-bit (DuckDB: ('0x'||substr(md5(s),1,8))
    ::UBIGINT), which lets the driver's oracle replay the whole MinHash
    pipeline in plain SQL instead of trusting a rows-only check."""
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
            .cast("long").bitwiseAND(F.lit(0x7FFFFFFF)))


def _md5_64(s: Column) -> Column:
    """64-bit hash from the first 16 md5 hex chars, assembled from two
    32-bit halves with bit ops only (shiftleft/bitwiseOR never overflow,
    unlike hi*2^32+lo under ANSI arithmetic)."""
    hi = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def _permute_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) params for k min-wise linear permutations.
    Kept below 2^31 so a*h + b stays under 2^63 (no long overflow — relevant
    under Spark ANSI mode and for correctness of the modulus)."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31)) for _ in range(k)]


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>), lowercased. Expression-valued —
    the token split re-evaluates inside the interpreted transform lambda, so
    corpus-scale callers should use :func:`with_shingles` (staged token
    column) instead."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - F.lit(1))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]))
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """``df`` plus a word-shingle array built from a STAGED token column, so
    the split runs once per row instead of once per (shingle × token) — the
    interpreted-HOF staging pattern (see lm_quality.exploded_char_ngrams)."""
    staged = df.withColumn(
        "__toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    toks = F.col("__toks")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - F.lit(1))
    # one slice + join per shingle instead of n element_at lookups: the
    # transform lambda runs interpreted, so expression-tree size is the
    # dominant cost (13-gram spans were ~10x slower with per-token concat)
    arr = F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.array_join(
            F.slice(toks, (i + 1).cast("int"), n), " ")))
    return staged.withColumn(out_col, arr).drop("__toks")


def minhash_signature(text: Column, k: int = 64, shingle_n: int = 3) -> Column:
    """k-element MinHash signature (array<long>).

    Single pass: hash each shingle once (md5 prefix), then fold the hash array
    into a running element-wise minimum of the k linear permutations
    (``aggregate`` + ``zip_with(least)``). Higher-order functions are
    interpreted (not whole-stage-codegen), so evaluating the shingle array
    once — instead of once per permutation — is a ~k× win on wide documents.
    See :func:`minhash_signature_udf` for the vectorized Arrow path used by
    the pair pipeline.
    """
    params = _permute_params(k)
    hashes = F.transform(shingles(text, shingle_n), _md5_31)
    init = F.array(*[F.lit(MERSENNE).cast("long") for _ in range(k)])
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[(h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE) for a, b in params]),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signature_udf(k: int = 64, shingle_n: int = 3):
    """Vectorized MinHash signature as an Arrow-batched pandas UDF.

    Spark's higher-order array functions run interpreted, so the pure
    expression form re-evaluates a deep tree per row. Here each Arrow batch
    is processed with numpy: md5-prefix hash per shingle (hashlib, C-speed),
    then one (k × n_shingles) broadcasted permute + min. ~5-10× faster per
    core on ~300-char documents than the interpreted expression tree, the
    signature is stable across runs (unlike Python's salted hash), and it
    matches :func:`minhash_signature` and the DuckDB oracle bit-for-bit."""
    import numpy as np
    from hashlib import md5

    params = _permute_params(k)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]

    @F.pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        empty = np.full(k, MERSENNE, dtype=np.int64)
        for t in texts:
            toks = _ws_tokens(t)
            if len(toks) <= shingle_n:
                grams = [" ".join(toks)]
            else:
                grams = [" ".join(toks[i:i + shingle_n])
                         for i in range(len(toks) - shingle_n + 1)]
            if not grams:
                out.append(empty)
                continue
            h = np.array([int.from_bytes(md5(g.encode()).digest()[:4], "big")
                          & 0x7FFFFFFF for g in grams], dtype=np.int64)
            out.append(((a * h + b) % MERSENNE).min(axis=1))
        return pd.Series(out)

    return sig


def shingle_set_udf(shingle_n: int = 3):
    """Per-document DISTINCT word-shingle set (sorted array<string>) as an
    Arrow-batched pandas UDF — the vectorized twin of the expression-form
    :func:`shingles` for consumers that need the SET of grams (exact
    Jaccard truth, set-similarity joins). Tokenization is
    :func:`_ws_tokens` — the ASCII ``\\s+`` split with empty tokens
    dropped that :func:`minhash_signature_udf` and the DuckDB oracles
    share (tests/test_tokenize_parity.py locks all three on DuckDB
    itself). Emitting the per-doc set directly means a downstream
    ``explode`` yields already-distinct ``(id, tok)`` rows, so callers can
    skip a global ``distinct()`` shuffle outright (guide §2.3/§2.4), and
    the per-row work runs at C speed instead of through the interpreted
    higher-order-function expression tree (guide §4.2)."""

    @F.pandas_udf("array<string>")
    def gram_set(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = _ws_tokens(t)
            if len(toks) <= shingle_n:
                grams = {" ".join(toks)}
            else:
                grams = {" ".join(toks[i:i + shingle_n])
                         for i in range(len(toks) - shingle_n + 1)}
            out.append(sorted(grams))
        return pd.Series(out)

    return gram_set


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest: keeps the minimum id per digest.
    Shuffles only (digest, id) pairs."""
    digest = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), digest.alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_paragraphs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", sep: str = "\n\n") -> DataFrame:
    """Corpus-wide duplicate-paragraph removal (the CCNet/C4 recipe):
    split every document on ``sep``, keep only the FIRST occurrence of each
    paragraph across the whole corpus (ordered by (doc id, position)), and
    reassemble the surviving paragraphs in their original order. Documents
    whose every paragraph was seen earlier come back with empty text.

    Output: ``(id_col, text_col, n_paras, n_kept)``.

    Plan shape: map-side posexplode → ONE shuffle on the paragraph digest
    (row_number picks the global first occurrence) → ONE shuffle on the doc
    id to reassemble (sort_array over collected (pos, para) structs) → left
    join back to the id universe so fully-deduped docs survive as empty.
    Both shuffles are linear in paragraph count; no corpus text travels
    twice — the digest shuffle carries (digest, id, pos, para) only."""
    from pyspark.sql import Window

    # F.split takes a REGEX; quote the separator (Pattern.quote form) so
    # ". " or "|" split literally instead of shredding the document
    sep_re = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re)).alias("__pos", "__para"),
    )
    w = Window.partitionBy(F.md5(F.col("__para"))) \
        .orderBy(F.col(id_col).asc(), F.col("__pos").asc())
    kept = (paras.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws(sep, F.transform(
                        F.sort_array(F.collect_list(
                            F.struct("__pos", "__para"))),
                        lambda s: s["__para"])).alias(text_col),
                    F.count(F.lit(1)).alias("n_kept")))
    universe = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep_re)).alias("n_paras"))
    return (universe.join(rebuilt, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
                    F.col("n_paras"),
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept")))


def band_entries_for(with_sig: DataFrame, k: int, bands: int,
                     extra: tuple[str, ...] = ()) -> DataFrame:
    """Explode a (id, sig) frame into (id, band, bucket) LSH band entries —
    map-side only, streaming-safe (used by both the batch pair pipeline and
    the stream-static near-dup join). ``extra`` columns (e.g. an event-time
    column a streaming caller needs for its watermark) pass through."""
    rows = k // bands
    return with_sig.select(
        "id",
        *extra,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string")
                                                  for r in range(rows)])).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", *extra, F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_pairs_per_entry: int = 8,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b, sig_agreement) where sig_agreement estimates
    Jaccard similarity. rows = k/bands hashes per band; two docs collide if
    any band matches."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    sig = minhash_signature_udf(k, shingle_n)(F.col(text_col))
    # Signatures are tiny relative to the corpus (k longs + id per doc), so
    # repartition the scan (a single small parquet file reads as one input
    # split) and persist: both the band explode and the two agreement joins
    # below reuse them without recomputing the text pass.
    with_sig = (
        df.select(F.col(id_col).alias("id"), F.col(text_col))
        .repartition(par)
        .select("id", sig.alias("sig"))
        .persist()
    )

    band_entries = band_entries_for(with_sig, k, bands)

    # Pair generation per bucket (one window shuffle on uniformly-hashed
    # bucket keys — no self-join). Buckets of exact duplicates would blow up
    # quadratically, so each doc pairs with at most `max_pairs_per_entry`
    # successors in the sorted bucket: connected-component transitivity still
    # links every duplicate cluster (rank-adjacent pairs chain the whole
    # bucket) while pair count stays linear in docs. lead() over the sorted
    # bucket keeps per-row state at max_pairs_per_entry ids — unlike a
    # per-bucket collect_list, a mega-bucket of boilerplate exact dupes
    # never materializes as one giant array row; the window sort spills.
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "bucket").orderBy("id")
    succ = F.array(*[F.lead("id", d).over(w)
                     for d in range(1, max_pairs_per_entry + 1)])
    pairs = (
        band_entries
        .select(F.col("id").alias("id_a"), succ.alias("succ"))
        .select("id_a", F.explode("succ").alias("id_b"))
        .filter(F.col("id_b").isNotNull())
        .dropDuplicates(["id_a", "id_b"])
    )

    sigs_a = with_sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sigs_b = with_sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x))
    return (
        pairs.join(sigs_a, "id_a").join(sigs_b, "id_b")
        .select("id_a", "id_b",
                (agree.cast("double") / F.size("sig_a")).alias("sig_agreement"))
    )


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles. For each bit j, sum +-1 weighted by
    the shingle-hash's bit j, then take the sign.

    Single fold over the shingle-hash array keeping 64 running counters
    (array<long> accumulator) — the shingle array is computed once, not once
    per bit (higher-order functions are interpreted, so re-evaluation is the
    dominant cost on wide documents)."""
    return simhash64_from(shingles(text, shingle_n))


def simhash64_from(shingle_arr: Column) -> Column:
    """SimHash fold over an already-built shingle array (pass a STAGED
    column on corpus-scale paths — see :func:`with_shingles`). Shingle
    hash is the md5-hex-prefix 64-bit value so a SQL oracle can replay
    the fingerprint exactly (see :func:`_md5_64`)."""
    hashes = F.transform(shingle_arr, _md5_64)
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(64)])
    counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[(F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)).cast("long")
                       * 2 - 1) for j in range(64)]),
            lambda x, y: x + y,
        ),
    )
    # bit j contributes 2^j; bit 63 is the sign bit of the result long
    powers = F.array(*[F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
                       for j in range(64)])
    return F.aggregate(
        F.zip_with(counts, powers,
                   lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def chunk_entries_for(fp: DataFrame, id_col: str = "id",
                      fp_col: str = "fp",
                      extra: tuple = ()) -> DataFrame:
    """Explode a 64-bit fingerprint frame into its four 16-bit banding
    chunks: ``(id, *extra, chunk, key)`` — the ONE chunking scheme
    shared by :func:`hamming_banded_pairs` and the streaming media
    index/probe pair (``streaming.dedup.build_phash_index`` /
    ``stream_phash_neardup_flags``); a change here changes index and
    probe keys together, never one side. NULL fingerprints are dropped
    (they have no distance to anything)."""
    sh = (fp.where(F.col(fp_col).isNotNull())
          .select(F.col(id_col).alias("id"), *extra,
                  F.col(fp_col).alias("sh")))
    return sh.select(
        "id", *extra, "sh",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned("sh", c * 16)
                     .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for c in range(4)
        ])).alias("ck"),
    ).select("id", *extra, "sh", F.col("ck.chunk").alias("chunk"),
             F.col("ck.key").alias("key"))


def hamming_banded_pairs(fp: DataFrame, id_col: str = "id",
                         fp_col: str = "fp", max_distance: int = 3,
                         max_pairs_per_entry: int = 8) -> DataFrame:
    """Near-dup pairs over ANY 64-bit fingerprint frame ``(id, fp)`` —
    the banding + verify stage shared by the SimHash text path and the
    perceptual image-hash path (multimodal.image_hashes): block on the
    four 16-bit chunks (pigeonhole: any pair within Hamming distance 3
    agrees on at least one chunk, so recall is GUARANTEED for
    ``max_distance <= 3`` up to the per-entry cap), generate candidates
    by lead()-window successor pairing inside each bucket (a degenerate
    bucket yields a linear, not quadratic, number of pairs; rank-adjacent
    pairs keep it one connected component), then verify by exact
    Hamming distance. Output: ``(id_a, id_b, hamming)``.

    NULL fingerprints (e.g. undecodable images) are dropped up front —
    they have no distance to anything."""
    from pyspark.sql import Window as W

    # NOT dead code (r10 advice): this one-row-per-id projection feeds
    # the sh_a/sh_b verify joins below. chunk_entries_for's output also
    # carries the fingerprint but at 4 rows per id — deriving the verify
    # side from it would need a dedup shuffle this projection avoids.
    sh = (fp.where(F.col(fp_col).isNotNull())
          .select(F.col(id_col).alias("id"), F.col(fp_col).alias("sh")))
    chunks = chunk_entries_for(fp, id_col, fp_col) \
        .select("id", "chunk", "key")
    w = W.partitionBy("chunk", "key").orderBy("id")
    succ = F.array(*[F.lead("id", d).over(w)
                     for d in range(1, max_pairs_per_entry + 1)])
    pairs = (
        chunks
        .select(F.col("id").alias("id_a"), succ.alias("succ"))
        .select("id_a", F.explode("succ").alias("id_b"))
        .filter(F.col("id_b").isNotNull())
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(sh_a, "id_a").join(sh_b, "id_b")
        .select("id_a", "id_b",
                hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
    )


def simhash_dedup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        max_distance: int = 3,
                        max_pairs_per_entry: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit chunks (any of 4 chunks
    equal -> candidate; guarantees recall for distance <= 3 before the
    per-entry cap), verify by Hamming distance.

    Pair generation mirrors the MinHash path: one groupBy on the chunk-key
    buckets, each doc pairing with at most ``max_pairs_per_entry`` successors
    in the sorted bucket. A degenerate bucket (e.g. millions of identical
    docs sharing one 16-bit key) then yields a linear — not quadratic —
    number of pairs; connected-component transitivity still links the whole
    duplicate cluster."""
    par = df.sparkSession.sparkContext.defaultParallelism
    # Stage the shingle array as a real column BEFORE the simhash fold:
    # simhash64's lambdas would otherwise re-run the split/concat shingle
    # expression per element (interpreted HOFs), which dominates on wide
    # documents (same fix as lm_quality/decontam exploded paths).
    sh = (
        with_shingles(df.select(F.col(id_col).alias("id"), F.col(text_col))
                      .repartition(par), text_col, n=2, out_col="__sh_arr")
        .select("id", simhash64_from(F.col("__sh_arr")).alias("sh"))
        .persist()
    )
    # banding + lead()-window pairing + Hamming verify live in
    # hamming_banded_pairs, shared with the perceptual image-hash path
    return hamming_banded_pairs(sh, id_col="id", fp_col="sh",
                                max_distance=max_distance,
                                max_pairs_per_entry=max_pairs_per_entry)


def _components_driver(edges: DataFrame) -> DataFrame:
    """Single-pass union-find over a COLLECTED edge list — the small-graph
    short-circuit of :func:`dedup_clusters`. Path-compressed union-find,
    then each component labeled with its minimum member, matching the
    pointer-jumping fixpoint exactly. Only called when the edge frame is
    known to fit on the driver (bounded by ``small_graph_edges``)."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = []
    for members in comp.values():
        m = min(members)
        out.extend((n, m) for n in members)
    from pyspark.sql.types import StructField, StructType

    t = edges.schema["a"].dataType
    schema = StructType([StructField("id", t), StructField("cluster", t)])
    return edges.sparkSession.createDataFrame(out, schema)


def dedup_clusters(pairs: DataFrame, max_iter: int = 20,
                   small_graph_edges: int = 500_000) -> DataFrame:
    """Connected components over candidate near-dup pairs: returns
    (id, cluster) where cluster is the minimum doc id reachable through the
    pair graph.

    Each round does (a) min-label propagation along edges and (b) pointer
    jumping (cluster <- label of cluster), so convergence is O(log diameter)
    rounds rather than O(diameter) — the per-entry pair caps in the LSH /
    SimHash generators produce successor *chains* whose diameter grows with
    cluster size, which plain propagation cannot afford. The (small) label
    frame is localCheckpoint'ed per round: lineage stays flat (no nested
    join tree for Catalyst to re-plan each round). Convergence: the old
    label rides along as a column, so changed-row counting happens INSIDE
    the round's materializing aggregate — no separate compare-join or
    isEmpty job per round. This is the standard large-scale alternative to
    driver-side union-find.

    Small-graph short-circuit: when the symmetrized edge frame has at
    most ``small_graph_edges`` rows — one cheap count on the
    already-checkpointed frame — components resolve in ONE driver-side
    union-find pass instead of O(log diameter) Spark rounds, each of which
    costs fixed scheduler latency that dominates wall-clock on small
    graphs. The 100x path (edge count above the bound) keeps the
    log-round distributed contract untouched; pass
    ``small_graph_edges=0`` to force it."""
    import logging

    edges = (pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
             .unionByName(pairs.select(F.col("id_b").alias("a"),
                                       F.col("id_a").alias("b")))
             .localCheckpoint())
    if small_graph_edges > 0 and edges.count() <= small_graph_edges:
        return _components_driver(edges)
    labels = (edges.select(F.col("a").alias("id"))
              .distinct()
              .withColumn("cluster", F.col("id"))
              .localCheckpoint())
    rounds = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy(F.col("a").alias("id2"))
            .agg(F.min("cluster").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == F.col("id2"), "left")
            .select("id", F.col("cluster").alias("__old"),
                    F.least(F.col("cluster"),
                            F.coalesce(F.col("nmin"), F.col("cluster"))).alias("cluster"))
        )
        ptr = new_labels.select(F.col("id").alias("pid"),
                                F.col("cluster").alias("pcluster"))
        new_labels = (
            new_labels.join(ptr, new_labels["cluster"] == ptr["pid"], "left")
            .select("id", "__old",
                    F.least(F.col("cluster"),
                            F.coalesce(F.col("pcluster"), F.col("cluster"))).alias("cluster"))
            .persist()
        )
        n_changed = new_labels.agg(F.sum(
            (F.col("cluster") != F.col("__old")).cast("long")).alias("n")
        ).first()["n"] or 0
        labels = new_labels.select("id", "cluster").localCheckpoint()
        new_labels.unpersist()
        rounds += 1
        if n_changed == 0:
            break
    logging.getLogger(__name__).info(
        "dedup_clusters converged in %d rounds", rounds)
    return labels


def near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard: float | None = 0.8,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-duplicate removal: LSH candidate pairs -> (optional)
    exact n-gram Jaccard verification -> connected components -> keep the
    minimum id per cluster. Returns the surviving rows of ``df``.

    ``candidate_pairs`` (id_a, id_b) replaces the MinHash LSH candidate
    stage when the caller already has one — a deterministic blocking key,
    an external pair list — while keeping the verify/cluster/retain
    machinery identical."""
    pairs = (candidate_pairs if candidate_pairs is not None
             else minhash_lsh_pairs(df, text_col, id_col, k, bands, shingle_n))
    if min_jaccard is not None:
        verified = ngram_jaccard(pairs, df, text_col, id_col, shingle_n)
        pairs = verified.filter(F.col("jaccard") >= min_jaccard)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("cluster") != F.col("id")) \
                     .select(F.col("id").alias(id_col))
    return df.join(losers, on=id_col, how="left_anti")


def near_dedup_keep_best(
    df: DataFrame,
    score: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard: float | None = 0.8,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate removal keeping the BEST-scoring member of each
    duplicate cluster (quality-aware retention — the production corpus
    recipe: among near-identical crawls keep the highest-quality copy,
    not the arbitrary minimum id). ``score`` is any expression over
    ``df``'s columns (e.g. ``quality_score(F.col("text"))``); ties break
    to the smaller id for determinism.

    Same pipeline as :func:`near_dedup` (LSH → verify → connected
    components) plus one argmax window over the small (id, cluster,
    score) frame — cost is unchanged at corpus scale.
    ``candidate_pairs`` swaps the LSH candidate stage for a caller-supplied
    pair frame, as in :func:`near_dedup`."""
    from pyspark.sql import Window

    pairs = (candidate_pairs if candidate_pairs is not None
             else minhash_lsh_pairs(df, text_col, id_col, k, bands, shingle_n))
    if min_jaccard is not None:
        verified = ngram_jaccard(pairs, df, text_col, id_col, shingle_n)
        pairs = verified.filter(F.col("jaccard") >= min_jaccard)
    clusters = dedup_clusters(pairs)
    scored = (df.select(F.col(id_col), score.alias("__score"))
              .join(clusters, df[id_col] == clusters["id"], "inner")
              .select(id_col, "cluster", "__score"))
    w = (Window.partitionBy("cluster")
         .orderBy(F.col("__score").desc(), F.col(id_col).asc()))
    losers = (scored.withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") > 1)
              .select(id_col))
    return df.join(losers, on=id_col, how="left_anti")


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (id_a, id_b): the verify
    stage after LSH. Joins text back in (broadcast-eligible when the pair
    set is small), computes |A∩B| / |A∪B| with array ops.

    The per-doc DISTINCT gram set comes from :func:`shingle_set_udf` —
    one Arrow-batched pass at C speed instead of the interpreted
    higher-order shingle tree (guide §4.2; identical tokenization, and
    the intersect/union sizes are order-insensitive so sorted-set vs
    first-seen order changes nothing). The scan is repartitioned first
    (a single small parquet file reads as ONE input split — the UDF
    would otherwise run on one core) and the gram frame persisted so
    the two pair-side joins below evaluate it once."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    # materialize-once via lazy localCheckpoint, NOT persist: the r13
    # advice flagged that this persist was never unpersisted, so repeated
    # calls in a long-lived session accumulated CacheManager entries
    # until LRU eviction (guide §5). The checkpoint blocks are released
    # by the ContextCleaner when the frame is garbage-collected.
    texts = (docs.select(F.col(id_col).alias("id"), F.col(text_col))
             .repartition(par)
             .select("id", shingle_set_udf(n)(F.col(text_col)).alias("grams"))
             .localCheckpoint(eager=False))
    out = (
        df_pairs.join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return out.select(
        "id_a", "id_b",
        F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def _gram_md5_udf(n: int):
    """Arrow UDF emitting word-n-gram md5 digests directly: Spark's
    higher-order transform runs interpreted, so building wide (13-token)
    grams as expressions is ~10x slower per core than hashing them in
    Python (same tradeoff as minhash_signature_udf, and the same
    md5-replayable tokenization: lowercase, whitespace split, whole doc
    when < n)."""
    from hashlib import md5 as _md5

    @F.pandas_udf("array<string>")
    def gram_md5s(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = _ws_tokens(t)
            if len(toks) < n:
                grams = [" ".join(toks)]
            else:
                grams = [" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)]
            out.append([_md5(g.encode()).hexdigest() for g in grams])
        return pd.Series(out)

    return gram_md5s


def _exploded_gram_md5s(df: DataFrame, text_col: str, id_col: str,
                        n: int) -> DataFrame:
    """(id, gram_md5) rows, one per n-gram occurrence. Repartitions first:
    a small single-file corpus scans as ONE split (minhash idiom)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return (df.select(F.col(id_col).alias("id"), F.col(text_col))
            .repartition(par)
            .select("id", _gram_md5_udf(n)(F.col(text_col)).alias("__g"))
            .select("id", F.explode("__g").alias("gram_md5")))


def duplicate_ngram_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 13,
                          min_count: int = 2) -> DataFrame:
    """Corpus-wide repeated n-gram detection — the discovery stage of
    exact-substring deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" uses 50-token spans; 13 is the
    classic decontamination width): every word n-gram occurring at least
    ``min_count`` times — across documents or repeated within one — is a
    duplicated span.

    Returns (gram_md5, n_docs, n_occurrences, first_doc). Scale: the
    explode is token-linear, only the 16-byte md5 (never the gram text)
    enters the shuffle, and the groupBy keys are uniform hashes — no skew.
    Docs shorter than ``n`` tokens contribute their whole text as one
    span, so exact short-document duplicates are still caught."""
    return (_exploded_gram_md5s(df, text_col, id_col, n)
            .groupBy("gram_md5")
            .agg(F.count_distinct(F.col("id")).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min("id").alias("first_doc"))
            .filter(F.col("n_occurrences") >= min_count))


def ngram_novelty(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 13) -> DataFrame:
    """Per-document novelty score: the fraction of a document's word
    n-gram occurrences that appear nowhere else in the corpus (corpus-wide
    count == 1) — the inverse view of :func:`duplicate_ngram_spans`, used
    for novelty-weighted sampling and boilerplate downweighting.

    Returns (id_col, n_grams, n_novel, novelty). Two uniform-key shuffles:
    the gram-count groupBy and the per-doc rollup; the gram text never
    travels (16-byte md5s only). A gram repeated WITHIN one document is
    not novel (its corpus count is >= 2), matching the intuition that
    self-repetition is not new information."""
    grams = _exploded_gram_md5s(df, text_col, id_col, n)
    counts = grams.groupBy("gram_md5").agg(F.count(F.lit(1)).alias("__c"))
    return (grams.join(counts, "gram_md5")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum((F.col("__c") == 1).cast("long")).alias("n_novel"))
            .select(F.col("id").alias(id_col), "n_grams", "n_novel",
                    F.round(F.col("n_novel") / F.col("n_grams"), 6)
                    .alias("novelty")))


def _md5_60(s: Column) -> Column:
    """60-bit hash from the first 15 md5 hex chars — always positive in a
    signed 64-bit long, so signed (Spark) and unsigned (SQL) orderings
    agree; used where hashes are ORDERED (winnowing window minima), not
    just compared for equality."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def seeded_uniform(tag: Column) -> Column:
    """Deterministic uniform draw in the OPEN interval (0, 1) from a
    seed-tagged string column: ``(md5_60(tag) >> 9 + 0.5) / 2^51``.
    Every step is exact in binary (half-integers below 2^51 and the
    power-of-two divide are lossless), so any SQL engine replays the
    draw bit-for-bit — the shared primitive behind the DP Laplace
    noise, the Poisson bootstrap, and the Efraimidis-Spirakis sampler
    (batch + streaming). Change it ONLY in lockstep with the oracles."""
    return ((F.shiftright(_md5_60(tag), 9).cast("double") + F.lit(0.5))
            / F.lit(float(1 << 51)))


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, slide
    a window of ``w`` consecutive gram hashes, and select each window's
    MINIMUM hash (rightmost position on ties), deduplicating repeat
    selections. Guarantee: two documents sharing any token run of length
    >= ``w + k - 1`` share at least one selected fingerprint — the
    partial-copy detector that whole-document fingerprints
    (``textstats.fingerprint``) and MinHash (whole-doc similarity) both
    miss. Documents shorter than ``w`` grams contribute their single
    overall minimum.

    Output: ``(id_col, gram_pos, fp)`` — one row per distinct selection,
    ~2/(w+1) of gram count in expectation. Scale: gram hashing is one
    staged map-side pass; the window minimum is a per-doc ordered window
    (rows clamped to ``w``), one key shuffle; no arrays of the document
    ever sit in one aggregation row."""
    from pyspark.sql import Window as W

    par = df.sparkSession.sparkContext.defaultParallelism
    staged = with_shingles(
        df.select(F.col(id_col).alias("id"), F.col(text_col))
        .repartition(par), text_col, n=k, out_col="__sh")
    exploded = (staged
                .select("id", F.posexplode(
                    F.transform("__sh", _md5_60)).alias("pos", "fp")))
    wspec = (W.partitionBy("id").orderBy("pos")
             .rowsBetween(-(w - 1), W.currentRow))
    n_grams = F.count(F.lit(1)).over(W.partitionBy("id"))
    # min of (fp, -pos): smallest hash, rightmost position on ties — the
    # winnowing tie rule that makes selections position-robust
    sel = F.min(F.struct(F.col("fp"), (-F.col("pos")).alias("np"))).over(wspec)
    return (exploded
            .withColumn("__n", n_grams)
            .withColumn("__sel", sel)
            .filter((F.col("pos") >= w - 1) | (F.col("pos") == F.col("__n") - 1))
            .select("id",
                    (-F.col("__sel.np")).cast("int").alias("gram_pos"),
                    F.col("__sel.fp").alias("fp"))
            .distinct()
            .withColumnRenamed("id", id_col))


def winnow_shared_spans(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4, w: int = 4,
                        min_shared: int = 2) -> DataFrame:
    """Partial-copy candidate pairs from shared winnowing fingerprints:
    pairs of documents sharing at least ``min_shared`` selected
    fingerprints, with the shared count — MOSS-style local-overlap
    detection (a quoted paragraph inside an otherwise unrelated document
    lights up here while its global Jaccard stays near zero).

    Scale: fingerprints are ~2/(w+1) of grams; the join shuffles only
    (fp, id) rows grouped on uniformly-distributed hashes, and hot
    fingerprints (boilerplate) are capped per fp at 16 doc ids
    (deterministic lowest ids) before all-pairs generation, so one viral
    footer can't emit a quadratic pair set. Members beyond the cap are
    NOT dropped: each rank-``cap``-and-above member pairs with its rank
    successor (the ``_oversized_chain_pairs`` pattern from the embedding
    near-dup path), so hot-fingerprint members stay connected — the
    recall caveat is that such members contribute at most one chain pair
    per hot fingerprint, so a genuine partial-copy pair where BOTH docs
    sit beyond the cap of every shared fingerprint can undercount
    n_shared; bounded, deterministic, and linear in bucket size."""
    from pyspark.sql import Window as W

    cap = 16
    # distinct (id, fp): a doc selecting the same fingerprint at several
    # positions (repeated content) must count once toward n_shared
    fps = winnow_fingerprints(df, text_col, id_col, k, w) \
        .select(F.col(id_col).alias("id"), "fp").distinct()
    # materialized once: the all-pairs self-join (two sides) AND the chain
    # window all read this frame — without it the whole text-scan +
    # window-min pipeline runs three times (measured 2.5x wall time).
    # localCheckpoint rather than persist(): it skips the CacheManager, so
    # repeated invocations in a long-lived session neither accumulate
    # pinned executor memory nor silently serve a prior run's cache to the
    # bench timing loop; the blocks are reclaimed when the frame is GC'd.
    ranked = fps.withColumn(
        "__rn", F.row_number().over(W.partitionBy("fp").orderBy("id"))) \
        .localCheckpoint(eager=True)
    capped = ranked.filter(F.col("__rn") <= cap)
    a = capped.select("fp", F.col("id").alias("id_a"))
    b = capped.select("fp", F.col("id").alias("id_b"))
    base = a.join(b, "fp").filter(F.col("id_a") < F.col("id_b")) \
        .select("fp", "id_a", "id_b")
    # chain pairs: rank r >= cap links to rank r+1 (rank cap bridges the
    # capped head to the tail), disjoint from base (one side is beyond
    # the cap), ids ascend with rank so id_a < id_b holds by construction
    chain = (ranked
             .withColumn("__nxt", F.lead("id").over(
                 W.partitionBy("fp").orderBy("id")))
             .filter((F.col("__rn") >= cap) & F.col("__nxt").isNotNull())
             .select("fp", F.col("id").alias("id_a"),
                     F.col("__nxt").alias("id_b")))
    return (base.unionByName(chain)
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def winnow_decontaminate(docs: DataFrame, benchmark: DataFrame,
                         k: int = 4, w: int = 4, min_shared: int = 2,
                         text_col: str = "text", id_col: str = "doc_id",
                         keep_flagged: bool = True,
                         broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark decontamination via winnowing fingerprints — the
    partial-copy contamination detector that exact 13-gram matching
    (:func:`otit_swt_spark.pipelines.decontam.decontaminate`) misses on
    light paraphrase: winnowing guarantees any preserved token run of
    length >= ``w + k - 1`` still collides, while a single edited word
    breaks every 13-gram crossing it.

    Annotates ``docs`` with ``n_shared_fps`` (count of DISTINCT selected
    fingerprints also selected anywhere in ``benchmark``) and a
    ``contaminated`` flag at ``>= min_shared``; ``keep_flagged=False``
    returns only clean documents.

    Plan shape mirrors ``decontaminate``: the benchmark reduces map-side
    to a distinct fingerprint SET (no per-doc pairing, so no per-fp cap
    is needed — a viral benchmark footer costs one set entry, never a
    quadratic join); broadcast by default, ``broadcast_benchmark=False``
    switches to a shuffle hash join on the uniformly-distributed hash for
    corpus-vs-corpus sweeps. The only corpus shuffle is the per-doc
    distinct count of MATCHING fingerprints — empty-to-tiny for a clean
    corpus."""
    bench_fps = (winnow_fingerprints(benchmark, text_col, id_col, k, w)
                 .select("fp").distinct())
    if broadcast_benchmark:
        bench_fps = F.broadcast(bench_fps)
    doc_fps = (winnow_fingerprints(docs, text_col, id_col, k, w)
               .select(id_col, "fp").distinct())
    hits = (doc_fps.join(bench_fps, "fp")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared_fps")))
    out = (docs.join(hits, id_col, "left")
           .withColumn("n_shared_fps",
                       F.coalesce(F.col("n_shared_fps"), F.lit(0)))
           .withColumn("contaminated",
                       F.col("n_shared_fps") >= F.lit(min_shared)))
    if not keep_flagged:
        out = out.filter(~F.col("contaminated")).drop(
            "contaminated", "n_shared_fps")
    return out


def cross_corpus_neardup_flags(train: DataFrame, ref: DataFrame,
                               text_col: str = "text", id_col: str = "doc_id",
                               k: int = 64, bands: int = 16,
                               shingle_n: int = 3,
                               max_ref_per_bucket: int = 4,
                               eager: bool = False) -> DataFrame:
    """Flag training documents that are near-duplicates of a reference
    corpus (held-out set, benchmark suite, earlier crawl) via a cross-corpus
    MinHash LSH band join — the fuzzy complement of 13-gram
    ``decontaminate``.

    Returns one row per flagged train doc: (id, n_candidates,
    max_agreement). Scale: both corpora are reduced to signatures map-side;
    the only shuffle is the band-bucket join, and the REF side of each
    bucket is capped at ``max_ref_per_bucket`` entries (deterministic: the
    lowest ref ids win) — any single collision flags the doc, so a cap on
    the evidence list changes at most which agreement is reported, never
    whether a doc is flagged, and a boilerplate mega-bucket stays linear.

    The two persisted signature frames stay cached until session LRU
    eviction; pass ``eager=True`` to materialize the (one-row-per-flagged-
    doc) result via ``localCheckpoint`` and release them before returning —
    the right mode inside long-running drivers."""
    from pyspark.sql import Window as W

    sig = minhash_signature_udf(k, shingle_n)
    par = train.sparkSession.sparkContext.defaultParallelism

    def _entries(df: DataFrame) -> tuple[DataFrame, DataFrame]:
        # persisted: both the band explode and the agreement join-back
        # reuse the signatures without re-running the text scan + UDF
        with_sig = (df.select(F.col(id_col).alias("id"), F.col(text_col))
                    .repartition(par)
                    .select("id", sig(F.col(text_col)).alias("sig"))
                    .persist())
        return with_sig, band_entries_for(with_sig, k, bands)

    train_sig, train_entries = _entries(train)
    ref_sig, ref_entries = _entries(ref)
    ref_capped = (ref_entries
                  .withColumn("__rn", F.row_number().over(
                      W.partitionBy("band", "bucket").orderBy("id")))
                  .filter(F.col("__rn") <= max_ref_per_bucket)
                  .select(F.col("id").alias("ref_id"), "band", "bucket"))
    cand = (train_entries.join(ref_capped, ["band", "bucket"])
            .select("id", "ref_id").dropDuplicates(["id", "ref_id"]))
    agree = F.size(F.filter(F.zip_with("sig", "ref_sig",
                                       lambda a, b: a == b), lambda x: x))
    out = (cand
           .join(train_sig, "id")
           .join(ref_sig.select(F.col("id").alias("ref_id"),
                                F.col("sig").alias("ref_sig")), "ref_id")
           .select("id", "ref_id",
                   (agree.cast("double") / k).alias("agreement"))
           .groupBy("id")
           .agg(F.count(F.lit(1)).alias("n_candidates"),
                F.max("agreement").alias("max_agreement")))
    if eager:
        out = out.localCheckpoint(eager=True)
        train_sig.unpersist(False)
        ref_sig.unpersist(False)
    return out


def ngram_containment(df_pairs: DataFrame, docs: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3) -> DataFrame:
    """Asymmetric n-gram containment ``|A ∩ B| / |A|`` (Broder): how much
    of document A lives inside document B. Catches near-SUBSET duplicates
    — quote inclusions, expanded revisions, boilerplate-wrapped copies —
    that symmetric Jaccard under-scores (a 100-line doc fully embedded in
    a 10k-line doc has tiny Jaccard but containment 1.0). Same join shape
    as :func:`ngram_jaccard`; emits both directions."""
    texts = (with_shingles(docs.select(F.col(id_col).alias("id"),
                                       F.col(text_col)),
                           text_col, n, out_col="__g")
             .select("id", F.array_distinct("__g").alias("grams")))
    out = (
        df_pairs
        .join(texts.withColumnRenamed("id", "id_a")
              .withColumnRenamed("grams", "grams_a"), "id_a")
        .join(texts.withColumnRenamed("id", "id_b")
              .withColumnRenamed("grams", "grams_b"), "id_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    return out.select(
        "id_a", "id_b",
        F.round(inter.cast("double")
                / F.greatest(F.size("grams_a"), F.lit(1)), 6)
        .alias("containment_a_in_b"),
        F.round(inter.cast("double")
                / F.greatest(F.size("grams_b"), F.lit(1)), 6)
        .alias("containment_b_in_a"),
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    test_pct: int = 10,
    val_pct: int = 10,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard: float = 0.8,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: every document is keyed by its near-dup CLUSTER root (LSH
    candidates -> exact n-gram Jaccard verify -> connected components),
    and the split is a deterministic md5 bucket of the ROOT — so all
    members of a duplicate cluster land in the same split by
    construction. Plain per-doc hash splitting puts ~2·p·(1-p) of each
    duplicate pair across the train/eval boundary, which inflates eval
    scores; splitting on the closure root is the standard fix.

    Returns (id, root, split) with split in {'train','val','test'}.
    Deterministic end to end (md5 bucketing, min-id roots) — replayable
    in any SQL engine. Scale: the closure is the pointer-jumping
    machinery of ``dedup_clusters`` (log-diameter rounds); the bucket
    assignment is map-side."""
    pairs = (candidate_pairs if candidate_pairs is not None
             else minhash_lsh_pairs(df, text_col, id_col, k, bands,
                                    shingle_n))
    verified = ngram_jaccard(pairs, df, text_col, id_col, shingle_n) \
        .filter(F.col("jaccard") >= min_jaccard)
    clusters = dedup_clusters(verified)
    out = (df.select(F.col(id_col).alias("id"))
           .join(clusters, "id", "left")
           .withColumn("root", F.coalesce("cluster", F.col("id"))))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("root").cast("string"))),
        1, 8), 16, 10).cast("long") % 100)
    split = (F.when(bucket < test_pct, F.lit("test"))
             .when(bucket < test_pct + val_pct, F.lit("val"))
             .otherwise(F.lit("train")))
    return out.select("id", "root", split.alias("split"))


def lsh_recall_eval(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", threshold: float = 0.8,
                    k: int = 64, bands: int = 16,
                    shingle_n: int = 3,
                    sample_fraction: float = 1.0,
                    sample_seed: str = "recall0") -> DataFrame:
    """Measured recall/precision of the banded-MinHash candidate
    generator against EXACT ground truth — the evaluation harness that
    turns "LSH should catch most near-dups" into a number you can
    regression-gate. Ground truth is the exact shingle-set Jaccard
    self-join at ``threshold`` via lossless prefix filtering
    (:func:`~otit_swt_spark.pipelines.fuzzy._ssjoin_pairs` over the
    SAME word-``shingle_n``-gram domain MinHash sketches); candidates
    are :func:`minhash_lsh_pairs` (banding, per-bucket caps and chain
    pairs included — so the number measures the REAL pipeline, blocking
    losses and all). One row out: ``(n_truth, n_candidates, n_hits,
    recall, precision)`` — precision here is "candidate pairs that are
    truly >= threshold", no second verify pass needed because truth is
    complete.

    ``sample_fraction < 1`` bounds the exact-truth cost at corpus
    scale: a DETERMINISTIC hash-sample of documents (seeded md5 of the
    id — replayable in SQL, no Bernoulli nondeterminism) is taken
    FIRST, and truth, candidates and hits are all computed on the same
    sample, so the measured recall is an unbiased estimate while the
    quadratic truth-pair mass shrinks ~fraction². At ``1.0`` (the
    default, and the oracle-gated setting) the eval is exact and
    bit-replayable."""
    from otit_swt_spark.pipelines.fuzzy import _ssjoin_pairs

    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError("sample_fraction must be in (0, 1]")
    if sample_fraction < 1.0:
        df = df.where(
            seeded_uniform(F.concat(F.lit(sample_seed + ":"),
                                    F.col(id_col).cast("string")))
            < F.lit(sample_fraction))

    # Truth-side gram pass through the vectorized set UDF: the per-doc
    # DISTINCT gram set explodes into already-unique (id, tok) rows, so
    # the global distinct() shuffle the expression form needed is gone
    # (guide §2.4), and the gram computation runs vectorized instead of
    # through the interpreted HOF tree (guide §4.2 — measured 9-12 s
    # single-task at sf0.1 for the expression form vs sub-second here).
    grams = (df.select(F.col(id_col).alias("id"), F.col(text_col))
             .select("id", F.explode(
                 shingle_set_udf(shingle_n)(F.col(text_col))).alias("tok")))
    truth = _ssjoin_pairs(grams, threshold).select("id_a", "id_b")
    cand = (minhash_lsh_pairs(df, text_col, id_col, k=k, bands=bands,
                              shingle_n=shingle_n)
            .select("id_a", "id_b").distinct())
    hits = truth.join(cand, ["id_a", "id_b"], "left_semi")
    t = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    c = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    h = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (t.crossJoin(F.broadcast(c)).crossJoin(F.broadcast(h))
            .select("n_truth", "n_candidates", "n_hits",
                    F.when(F.col("n_truth") > 0,
                           F.round(F.col("n_hits")
                                   / F.col("n_truth").cast("double"), 6))
                    .otherwise(F.lit(1.0)).alias("recall"),
                    F.when(F.col("n_candidates") > 0,
                           F.round(F.col("n_hits")
                                   / F.col("n_candidates")
                                   .cast("double"), 6))
                    .otherwise(F.lit(1.0)).alias("precision")))
