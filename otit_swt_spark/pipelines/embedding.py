"""Feature-hashing document embeddings (the "hashing trick"): map each
token into one of ``dim`` buckets by hashing, count, L2-normalize — a
deterministic, vocabulary-free document vector that feeds the similarity
operators (brute-force / LSH / IVF cosine) without any model artifact.

The bucket assignment reuses the md5-range split from
``pipelines.sampling.hash_shard`` (equal slices of the md5 space), so an
external SQL engine reproduces the embedding BIT-EXACTLY — this is the
bridge that lets the text→vector→ANN pipeline be correctness-gated end to
end, unlike learned embeddings.

Scale shape: map-side token explode → one groupBy on (doc, bucket) →
one groupBy on doc assembling the fixed-width vector (map lookup over a
``sequence``, no pivot) — two key-partitioned shuffles, rows bounded by
|docs| × dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from otit_swt_spark.pipelines.sampling import hash_shard
from otit_swt_spark.pipelines.textstats import _word_tokens


def feature_hash_embed(docs: DataFrame, dim: int = 64,
                       text_col: str = "text", id_col: str = "doc_id",
                       normalize: bool = True, salt: str = "emb",
                       ) -> DataFrame:
    """``(id_col, embedding array<double>)`` — token-count vector in
    ``dim`` hash buckets, L2-normalized by default (zero-token docs get a
    zero vector)."""
    toks = (docs
            .withColumn("__toks", _word_tokens(F.col(text_col)))
            .select(F.col(id_col), F.explode("__toks").alias("token")))
    bucketed = hash_shard(toks, "token", dim, salt=salt, shard_col="bucket")
    counts = (bucketed.groupBy(id_col, "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))
    vec = (counts.groupBy(id_col)
           .agg(F.map_from_entries(
                    F.collect_list(F.struct("bucket", "cnt"))).alias("__m"))
           .select(F.col(id_col),
                   F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                               lambda b: F.coalesce(
                                   F.element_at("__m", b.cast("int")),
                                   F.lit(0)).cast("double"))
                   .alias("embedding")))
    # docs with zero tokens drop out of the explode — restore as zeros
    zeros = F.array(*[F.lit(0.0) for _ in range(dim)])
    out = (docs.select(id_col)
           .join(vec, id_col, "left")
           .select(F.col(id_col),
                   F.coalesce("embedding", zeros).alias("embedding")))
    if not normalize:
        return out
    nrm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0),
                             lambda a, x: a + x * x))
    unit = F.transform(F.col("embedding"),
                       lambda x: F.try_divide(x, nrm))
    return out.select(
        F.col(id_col),
        F.when(nrm > 0, unit).otherwise(F.col("embedding")).alias("embedding"))


def feature_hash_embed_tfidf(docs: DataFrame, dim: int = 64,
                             text_col: str = "text", id_col: str = "doc_id",
                             salt: str = "emb") -> DataFrame:
    """TF-IDF-weighted variant: bucket counts scaled by
    ``ln(N / df(bucket))`` where df is the number of documents containing
    the bucket — down-weights stopword-heavy buckets. One extra
    domain-bounded aggregate (``dim`` rows — always broadcastable), then
    the same assembly as :func:`feature_hash_embed`; L2-normalized."""
    toks = (docs
            .withColumn("__toks", _word_tokens(F.col(text_col)))
            .select(F.col(id_col), F.explode("__toks").alias("token")))
    bucketed = hash_shard(toks, "token", dim, salt=salt, shard_col="bucket")
    counts = (bucketed.groupBy(id_col, "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))
    n_docs = docs.select(id_col).distinct().count()
    dfreq = (counts.groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("df")))
    weighted = (counts.join(F.broadcast(dfreq), "bucket")
                .select(id_col, "bucket",
                        (F.col("cnt") * F.log(F.lit(float(n_docs)) /
                                              F.col("df"))).alias("w")))
    vec = (weighted.groupBy(id_col)
           .agg(F.map_from_entries(
                    F.collect_list(F.struct("bucket", "w"))).alias("__m"))
           .select(F.col(id_col),
                   F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                               lambda b: F.coalesce(
                                   F.element_at("__m", b.cast("int")),
                                   F.lit(0.0))).alias("embedding")))
    zeros = F.array(*[F.lit(0.0) for _ in range(dim)])
    out = (docs.select(id_col)
           .join(vec, id_col, "left")
           .select(F.col(id_col),
                   F.coalesce("embedding", zeros).alias("embedding")))
    nrm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0),
                             lambda a, x: a + x * x))
    unit = F.transform(F.col("embedding"), lambda x: F.try_divide(x, nrm))
    return out.select(
        F.col(id_col),
        F.when(nrm > 0, unit).otherwise(F.col("embedding")).alias("embedding"))


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        bits: int = 8) -> DataFrame:
    """Symmetric per-vector integer quantization — the memory-scale path
    for ANN at 100 TB: an int8 vector is 4× smaller than float32 (8× vs
    float64), which turns a shuffle-heavy candidate join into one that
    fits executor memory, at a bounded recall cost.

    Per vector: ``scale = max(|x|) / qmax`` (qmax = 2^(bits-1) - 1, e.g.
    127), ``q_i = floor(x_i / scale + 0.5)`` (explicit half-up floor so
    the rounding is engine-independent — SQL ``round`` is half-even in
    some engines and half-away in others). All-zero vectors keep scale 0
    and an all-zero code. Emits the reconstruction RMSE so a pipeline can
    gate on quantization error.

    Pure elementwise built-ins (transform/aggregate), zero shuffle, and
    bit-exactly reproducible in any SQL engine with list lambdas.
    """
    qmax = (1 << (bits - 1)) - 1
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0),
                       lambda a, x: F.greatest(a, F.abs(x)))
    scale = amax / F.lit(float(qmax))
    q = F.when(amax > 0,
               F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5))
                           .cast("int"))
               ).otherwise(F.transform(v, lambda x: F.lit(0)))
    # internal name distinct from the output alias: Spark's lateral column
    # alias resolution would otherwise bind the rmse expression's "scale"
    # to the ROUNDED output column in the same select
    staged = df.select(F.col(id_col), v.alias("__v"),
                       scale.alias("__scale"), q.alias("qvec"))
    err2 = F.aggregate(
        F.zip_with(F.col("__v"), F.col("qvec"),
                   lambda x, qi: (x - qi * F.col("__scale"))
                   * (x - qi * F.col("__scale"))),
        F.lit(0.0), lambda a, x: a + x)
    return staged.select(
        F.col(id_col),
        F.round(F.col("__scale"), 9).alias("scale"),
        F.col("qvec"),
        F.round(F.sqrt(err2 / F.size(F.col("qvec"))), 6).alias("rmse"))


def quantized_topk(df: DataFrame, query_id, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   bits: int = 8) -> DataFrame:
    """Cosine top-k scored on DEQUANTIZED int8 vectors — the memory-scale
    ANN path end to end: quantize once (4× smaller corpus state), score
    candidates against the quantized representation, and accept the
    bounded recall loss. The query vector is quantized the same way, so
    the whole scoring pipeline touches only int codes + one scale per
    vector. Deterministic and SQL-reproducible (unlike learned PQ
    codebooks)."""
    from otit_swt_spark.pipelines.similarity import cosine

    qz = quantize_embeddings(df, id_col=id_col, vec_col=vec_col, bits=bits)
    deq = qz.select(
        F.col(id_col),
        F.transform(F.col("qvec"),
                    lambda x: x.cast("double") * F.col("scale")).alias("dv"))
    qv = (deq.filter(F.col(id_col) == query_id)
          .select(F.col("dv").alias("qv")))
    scored = deq.crossJoin(F.broadcast(qv)).select(
        F.col(id_col),
        F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def embed_topk(docs: DataFrame, query_id, k: int = 10, dim: int = 64,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """End-to-end text similarity: hash-embed the corpus, take the query
    doc's vector, exact cosine top-k (the scale path swaps the brute-force
    stage for the LSH/IVF operators in pipelines.similarity)."""
    from otit_swt_spark.pipelines.similarity import cosine

    emb = feature_hash_embed(docs, dim, text_col, id_col)
    q = (emb.filter(F.col(id_col) == query_id)
         .select(F.col("embedding").alias("qv")))
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def random_projection(df: DataFrame, out_dim: int = 8, seed: int = 7,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each vector
    onto ``out_dim`` fixed Gaussian directions (seeded — any engine with
    the plane constants reproduces the output bit-for-bit). Map-side only:
    the planes ride in the plan as literals, no shuffle, no fit pass —
    the cheap way to shrink 100 TB of float32 before an ANN build."""
    from otit_swt_spark.pipelines.similarity import (_dim_of, _hyperplanes,
                                                     dot)

    planes = _hyperplanes(_dim_of(df, vec_col), out_dim, seed=seed)
    v = F.col(vec_col).cast("array<double>")
    comps = [F.round(dot(v, F.array(*[F.lit(float(x)) for x in p])), 6)
             for p in planes]
    return df.select(F.col(id_col), F.array(*comps).alias("projected"))


def label_centroids(df: DataFrame, label_col: str = "label",
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid statistics: member count, centroid L2 norm, and
    cohesion (mean cosine of members to their centroid) — the embedding-
    space health check behind clustering/mining runs (a low-cohesion label
    is mislabeled or multi-modal).

    Plan: posexplode -> one (label, dim) aggregation for centroids (never
    an array-of-arrays in one row), rebuild the centroid array ordered by
    position, broadcast it back (|labels| rows), and one more aggregation
    for cohesion. Two shuffles total, both on small keys; no per-label
    vector materialization anywhere."""
    from otit_swt_spark.pipelines.similarity import cosine

    comp = (df.select(label_col, F.posexplode(F.col(vec_col).cast("array<double>"))
                      .alias("pos", "x"))
            .groupBy(label_col, "pos").agg(F.avg("x").alias("m")))
    cent = (comp.groupBy(label_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(label_col,
                    F.transform("pm", lambda s: s["m"]).alias("centroid")))
    joined = df.join(F.broadcast(cent), label_col)
    cos = cosine(F.col(vec_col).cast("array<double>"), F.col("centroid"))
    norm_sq = F.aggregate(F.transform("centroid", lambda x: x * x),
                          F.lit(0.0), lambda a, x: a + x)
    return (joined.groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.sqrt(F.first(norm_sq)), 6).alias("centroid_norm"),
                 F.round(F.avg(cos), 6).alias("cohesion")))


def standardize_embeddings(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Per-DIMENSION standardization (zero mean, unit sample variance) of
    an embedding column — the scaler fit+transform that precedes
    distance-based ops when dimensions carry different scales.

    The moments come from ONE posexplode + group pass using exact DECIMAL
    sums (like ab_test_stats/profile), so mean and stddev are independent
    of partitioning and summation order — a SQL engine reproduces the
    standardized values bit-for-bit. The per-dimension stats are a
    bounded driver collect (dim rows, never corpus rows); the transform
    itself is a map-side literal expression. Zero-variance dimensions
    standardize to 0.0. Output: (id_col, array<double> ``z`` rounded to
    6 dp)."""
    import math

    dec = "decimal(38,12)"
    x = F.col("x").cast("double")
    stats = (df.select(F.posexplode(vec_col).alias("pos", "x"))
             .groupBy("pos")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(x.cast(dec)).alias("s"),
                  F.sum((x * x).cast(dec)).alias("q"))
             .orderBy("pos").collect())
    mu, sd = [], []
    for r in stats:
        # float() of the exact decimal sums == CAST(... AS DOUBLE): keep
        # the arithmetic order identical to the oracle's formula
        m = float(r["s"]) / r["n"]
        var = ((float(r["q"]) - float(r["s"]) * float(r["s"]) / r["n"])
               / (r["n"] - 1)) if r["n"] > 1 else 0.0
        mu.append(m)
        sd.append(math.sqrt(var) if var > 0 else 0.0)
    v = F.col(vec_col)
    comps = [
        F.round(F.lit(0.0) if sd[i] == 0.0 else
                (F.element_at(v, i + 1).cast("double") - F.lit(mu[i]))
                / F.lit(sd[i]), 6)
        for i in range(len(stats))]
    return df.select(F.col(id_col), F.array(*comps).alias("z"))


def pq_fit(df: DataFrame, m: int = 8, codebook_size: int = 16,
           iters: int = 2, id_col: str = "vec_id",
           vec_col: str = "embedding") -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011): split each
    vector into ``m`` contiguous subspaces and run fixed-iteration Lloyd
    per subspace under ``pipelines.clustering``'s determinism contract
    (min-id distinct-vector seeding, DECIMAL-sum updates, lowest-index
    tie-break) — which is what makes a LEARNED codebook SQL-replayable.
    Returns ``m`` codebooks of ``codebook_size`` sub-centroids each
    (driver-bounded model state: m × k × dim/m doubles).

    Scale: each fit is one map-side assignment + one (cluster, dim)-keyed
    aggregate per round over the subvector projection; the ``m`` fits are
    independent passes (at cluster scale, fuse them by training on a
    sampled slice — the codebook needs distributional coverage, not the
    full corpus)."""
    from otit_swt_spark.pipelines.clustering import kmeans_fit

    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    # Land the input ONCE before anything reads it (r13-advice item 5):
    # the m subspace fits each run multi-job chains over `base` from
    # concurrent driver threads, and their first actions could race to
    # recompute the upstream frame (e.g. ivf's residual zip_with) before
    # a lazy checkpoint materializes. Eager here is semantically inert —
    # pq_fit always executes jobs at build anyway (the dim probe below).
    # Measured ivf_pq_topk interleaved medians 16.2 -> 14.3 s
    # (overlapping spreads; direction-only evidence).
    base = base.localCheckpoint(eager=True)
    dim = len(base.select("v").first()["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    # The m per-subspace fits are INDEPENDENT job chains (seed collect +
    # one aggregate per Lloyd round each); run them overlapped from a
    # small driver thread pool so later subspaces back-fill the cluster
    # while earlier ones wait on their driver reads (guide §2.6 —
    # "overlap independent jobs"). Each fit's result is deterministic and
    # unaffected by scheduling; the returned list stays subspace-ordered.
    from concurrent.futures import ThreadPoolExecutor

    def _fit(j: int):
        return kmeans_fit(
            base.select("id", F.slice("v", j * sub + 1, sub).alias("sv")),
            k=codebook_size, iters=iters, id_col="id", vec_col="sv")

    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        return list(pool.map(_fit, range(m)))


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """PQ codes ``(id_col, codes array<int>)``: per subspace, the index
    of the nearest sub-centroid (lowest index on ties). Map-side only —
    the codebooks ride in the plan as literals; at 64 dims / m=8 / k=16
    the corpus state drops 32× (8 bytes vs 256)."""
    from otit_swt_spark.pipelines.clustering import _assign_expr

    v = F.col(vec_col).cast("array<double>")
    sub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        cl, _d = _assign_expr(F.slice(v, j * sub + 1, sub), book)
        codes.append(cl)
    return df.select(F.col(id_col), F.array(*codes).alias("codes"))


def _sq_l2(a: list[float], b: list[float]) -> float:
    """Ordered left-fold squared L2 — FP-identical to the SQL twin's
    list_dot_product(diff, diff)."""
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def pq_topk(df: DataFrame, query_id, k: int = 10, m: int = 8,
            codebook_size: int = 16, iters: int = 2,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: train codebooks,
    encode the corpus once, build the query's m×k distance table on the
    driver, and score every vector with ``m`` table lookups + adds — no
    float vectors touched at query time. This is the memory-scale ANN
    query path beyond scalar quantization (``quantized_topk``): corpus
    state is m small ints per vector, and the scoring pass is pure
    map-side lookup arithmetic, so a 100 TB corpus scans its codes at
    RAM-like density. Returns (id_col, adc_dist2) — the k smallest
    APPROXIMATE distances (quantization error bounds recall, the standard
    PQ trade)."""
    qrow = (df.filter(F.col(id_col) == query_id)
            .select(F.col(vec_col).cast("array<double>").alias("v"))
            .first())
    if qrow is None:
        raise ValueError(f"pq_topk: query_id {query_id!r} not found")
    q = qrow["v"]
    books = pq_fit(df, m, codebook_size, iters, id_col, vec_col)
    sub = len(books[0][0])
    enc = pq_encode(df, books, id_col, vec_col)
    adc = None
    for j, book in enumerate(books):
        qs = list(q[j * sub:(j + 1) * sub])
        table = F.array(*[F.lit(_sq_l2(qs, c)) for c in book])
        term = F.element_at(table, F.element_at("codes", j + 1) + 1)
        adc = term if adc is None else adc + term
    scored = enc.select(F.col(id_col), adc.alias("__raw"))
    return (scored.orderBy("__raw", id_col).limit(k)
            .select(id_col, F.round("__raw", 6).alias("adc_dist2")))


def ivf_pq_topk(df: DataFrame, query_id, k: int = 10,
                n_clusters: int = 8, n_probe: int = 2,
                m: int = 8, codebook_size: int = 16, iters: int = 2,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. 2011): a coarse Lloyd quantizer
    partitions the corpus into inverted lists, vectors store PQ codes of
    their RESIDUAL against their coarse centroid, and a query scans only
    the ``n_probe`` nearest lists with a per-list ADC table built from
    the query's residual — the full FAISS-style composition of the ANN
    ladder's pieces (``ann_ivf_topk``'s pruning × ``pq_topk``'s code
    arithmetic). Every stage follows the clustering determinism contract,
    so the whole thing — coarse training, residual codebooks, probe
    selection, ADC — replays in SQL.

    Scale: unprobed lists cost nothing at query time (at cluster scale,
    physically partition the code table by list id, as ann_ivf_topk's
    cluster dirs do, and probing prunes at the SCAN); corpus state is m
    small ints + one list id per vector; all driver state is bounded
    (coarse k×dim + m×k×dim/m codebooks + n_probe×m×k tables)."""
    from otit_swt_spark.pipelines.clustering import _assign_expr, kmeans_fit

    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    coarse = kmeans_fit(base, k=n_clusters, iters=iters,
                        id_col="id", vec_col="v")
    cl, _d = _assign_expr(F.col("v"), coarse)
    cent_lookup = F.element_at(
        F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in coarse]),
        F.col("list_id") + 1)
    # materialize the residual frame once: it feeds the m subspace fits
    # (each a multi-job chain), the encode pass and the list_id join —
    # without this every consumer re-evaluates the interpreted coarse
    # assignment + residual zip_with over the corpus
    resid = (base.withColumn("list_id", cl)
             .withColumn("rv", F.zip_with("v", cent_lookup,
                                          lambda a, b: a - b))
             .select("id", "list_id", "rv")
             .localCheckpoint(eager=False))
    books = pq_fit(resid, m=m, codebook_size=codebook_size, iters=iters,
                   id_col="id", vec_col="rv")
    codes = pq_encode(resid, books, id_col="id", vec_col="rv") \
        .join(resid.select("id", "list_id"), "id")
    sub = len(books[0][0])
    qrow = base.filter(F.col("id") == query_id).select("v").first()
    if qrow is None:
        raise ValueError(f"ivf_pq_topk: query_id {query_id!r} not found")
    q = qrow["v"]
    # probe selection: exact coarse distances, lowest index on ties —
    # the same left-fold arithmetic as the SQL replay
    cd = sorted(((_sq_l2(list(q), c), j) for j, c in enumerate(coarse)))
    probes = [j for _d2, j in cd[:n_probe]]
    # per-probe ADC tables from the query's residual against that list
    tables = {}
    for pj in probes:
        qr = [x - y for x, y in zip(q, coarse[pj])]
        tables[pj] = [
            [_sq_l2(qr[j * sub:(j + 1) * sub], c) for c in books[j]]
            for j in range(m)
        ]
    probe_pos = None
    for i, pj in enumerate(probes):
        cond = F.col("list_id") == pj
        probe_pos = (F.when(cond, i) if probe_pos is None
                     else probe_pos.when(cond, i))
    adc = None
    for j in range(m):
        per_probe = F.array(*[
            F.array(*[F.lit(t) for t in tables[pj][j]]) for pj in probes])
        term = F.element_at(F.element_at(per_probe, probe_pos + 1),
                            F.element_at("codes", j + 1) + 1)
        adc = term if adc is None else adc + term
    scored = (codes.filter(F.col("list_id").isin([int(p) for p in probes]))
              .select("id", "list_id", adc.alias("__raw")))
    return (scored.orderBy("__raw", "id").limit(k)
            .select(F.col("id").alias(id_col),
                    F.col("list_id"),
                    F.round("__raw", 6).alias("adc_dist2")))


def pq_index(df: DataFrame, path: str, m: int = 8,
             codebook_size: int = 16, iters: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[float]]]:
    """Materialize a PQ index: train the subspace codebooks ONCE
    (``pq_fit``), encode the corpus, write the ``(id, codes)`` table as
    parquet at ``path`` with the codebooks saved alongside as
    ``_codebooks.json`` (parquet readers skip ``_``-prefixed files).
    This is the PRODUCTION route for repeated ADC queries — ``pq_topk``
    retrains per call (fine as a correctness gate, wasteful as a serving
    path); the index amortizes the m Lloyd fits across every later
    query, and the persisted code table is the 32×-smaller artifact a
    100 TB corpus actually scans. Returns the codebooks."""
    import json

    from otit_swt_spark import fsutil

    books = pq_fit(df, m, codebook_size, iters, id_col, vec_col)
    pq_encode(df, books, id_col, vec_col) \
        .write.mode("overwrite").parquet(path)
    fsutil.write_text(df.sparkSession,
                      f"{path.rstrip('/')}/_codebooks.json",
                      json.dumps(books))
    return books


def pq_topk_indexed(spark, path: str, query_vec: list[float],
                    k: int = 10,
                    id_col: str = "vec_id") -> DataFrame:
    """Query a persisted ``pq_index``: load the codebook sidecar (tiny
    driver state), build the query's m×codebook_size ADC distance table
    driver-side, and score the code table with m lookups + adds per
    vector — no training, no float vectors, pure map-side arithmetic
    over the compact parquet codes. Same determinism contract as
    ``pq_topk``, so a query whose vector comes from the indexed corpus
    returns the identical ADC result the one-shot form computes."""
    import json

    from otit_swt_spark import fsutil

    books = json.loads(
        fsutil.read_text(spark, f"{path.rstrip('/')}/_codebooks.json"))
    sub = len(books[0][0])
    adc = None
    for j, book in enumerate(books):
        qs = [float(x) for x in query_vec[j * sub:(j + 1) * sub]]
        table = F.array(*[F.lit(_sq_l2(qs, c)) for c in book])
        term = F.element_at(table, F.element_at("codes", j + 1) + 1)
        adc = term if adc is None else adc + term
    codes = spark.read.parquet(path)
    return (codes.select(F.col(id_col), adc.alias("__raw"))
            .orderBy("__raw", id_col).limit(k)
            .select(id_col, F.round("__raw", 6).alias("adc_dist2")))


def power_iteration_pc1(df: DataFrame, vec_col: str = "embedding",
                        rounds: int = 4) -> DataFrame:
    """Top principal component of the embedding corpus by fixed-round
    power iteration on the (mean-centered) covariance direction:
    ``v_{r+1} = normalize(Σ_rows ((x−μ)·v_r)(x−μ))`` from the uniform
    unit start. Returns ``(pos, loading, eigenvalue)`` — one row per
    dimension with the PC1 loading and the shared eigenvalue estimate
    ``‖Σ terms‖ / n`` of the final round (the Rayleigh numerator under
    the 1/n covariance scaling).

    Never materializes the d×d covariance: each round is one map-side
    dot product against the broadcast-literal ``v_r`` plus one grouped
    per-dimension sum — two linear passes, state is d numbers on the
    driver (the bounded kmeans-style model read). Determinism contract
    (same as kmeans_fit): per-dimension sums run in DECIMAL(38,12)
    (partition-order independent), every float reduction that follows
    is an INDEX-ORDERED fold, so a SQL oracle replays all ``rounds``
    bit-for-bit including the final loadings."""
    import math

    base = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    head = base.select(F.size("v").alias("d")).first()
    if head is None:
        raise ValueError("power_iteration_pc1: empty corpus")
    d = head["d"]
    stats = (base.select(F.posexplode("v").alias("pos", "x"))
             .groupBy("pos")
             .agg(F.sum(F.col("x").cast("decimal(38,12)")).alias("s"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    n = stats[0]["n"]
    mu = [0.0] * d
    for r in stats:
        mu[r["pos"]] = float(r["s"]) / r["n"]
    vec = [1.0 / math.sqrt(d)] * d
    norm = 0.0
    for _ in range(rounds):
        mu_lit = F.array(*[F.lit(x) for x in mu])
        v_lit = F.array(*[F.lit(x) for x in vec])
        centered = F.zip_with("v", mu_lit, lambda x, m: x - m)
        dot = F.aggregate(F.zip_with(centered, v_lit, lambda c, w: c * w),
                          F.lit(0.0), lambda a, x: a + x)
        sums = (base.select(dot.alias("dot"), centered.alias("c"))
                .select("dot", F.posexplode("c").alias("pos", "x"))
                .groupBy("pos")
                .agg(F.sum((F.col("dot") * F.col("x"))
                           .cast("decimal(38,12)")).alias("s"))
                .collect())
        sv = [0.0] * d
        for r in sums:
            sv[r["pos"]] = float(r["s"])
        acc = 0.0
        for x in sv:                      # index-ordered norm fold
            acc = acc + x * x
        norm = math.sqrt(acc)
        vec = [x / norm for x in sv]
    spark = df.sparkSession
    rows = [(i + 1, round(vec[i], 6), round(norm / n, 6))
            for i in range(d)]
    return spark.createDataFrame(rows,
                                 "pos int, loading double, "
                                 "eigenvalue double")
