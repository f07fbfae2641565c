"""Distributed keyword search: inverted index, BM25 top-k, and
reciprocal-rank-fusion hybrid retrieval.

A training-data / RAG engine needs lexical retrieval next to the ANN
family (similarity.py): corpus triage ("find the documents about X"),
hard-negative mining for retrieval training, and the lexical leg of
hybrid search. Everything here is expression-only (no Python UDFs) and
deterministic, so the DuckDB oracles replay scores bit-for-bit.

Design for 100 TB:
- tokenization is map-side (one split per row, staged);
- the broadcast query-term set prunes the exploded term stream BEFORE
  any shuffle — the per-query cost scales with postings of the query
  terms, not the corpus token count;
- corpus statistics (N, average length) are one-row aggregates and the
  per-term document frequencies are |query|-row frames: both broadcast;
- the only corpus-sized shuffle is the per-doc score sum, keyed by the
  uniformly-distributed doc id;
- the standing inverted index is a plain (term, doc_id, tf) frame —
  bucket/sort it by term on write and term lookups become pruned scans.

BM25 per Robertson & Spärck Jones with the Lucene-style non-negative
idf: ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def doc_terms(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document term frequencies plus the document length in tokens:
    ``(id_col, term, tf, dl)``. One map-side explode, one groupBy on
    (doc, term) — uniformly distributed keys."""
    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"),
                       F.size(_tokens(text_col)).alias("dl"))
    return (toks.filter(F.col("term") != "")
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))


def build_inverted_index(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """The standing posting-list frame ``(term, doc_id, tf, df)``: one row
    per posting with the term's corpus document frequency denormalized on
    (so a query-time scorer needs no second aggregate). Write it
    partitioned/bucketed by term and a term lookup is a pruned scan —
    the layout, not a server, is the index."""
    t = doc_terms(docs, text_col, id_col)
    from pyspark.sql import Window as W

    df_ = F.count(F.lit(1)).over(W.partitionBy("term"))
    return t.select("term", F.col(id_col).alias("doc_id"), "tf",
                    df_.alias("df"))


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k for a whitespace query: ``(id_col, score, rank)`` with
    score rounded to 6 dp and rank dense over (score desc, id asc) —
    deterministic under ties.

    Plan: the exploded term stream filters against the broadcast literal
    query-term set FIRST (map-side, prunes to the query postings), then
    per-doc tf, |query|-row document frequencies (broadcast back), the
    one-row (N, avgdl) aggregate (broadcast), one score-sum shuffle on
    doc id, and a top-k sort of the matching docs only."""
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        raise ValueError("empty query")
    corpus = docs.select(F.col(id_col), _tokens(text_col).alias("__t"))
    # exact DECIMAL length sum -> ONE double division: the average is
    # bit-identical across engines and partition orders (the
    # standardize_embeddings moments discipline)
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("__t").cast("decimal(38,6)")).cast("double")
         / F.count(F.lit(1))).alias("avgdl"))
    posting = (corpus
               .select(id_col, F.size("__t").alias("dl"),
                       F.explode("__t").alias("term"))
               .filter(F.col("term").isin(q_terms))      # broadcast prune
               .groupBy(id_col, "term")
               .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    dfreq = (posting.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df")))
    scored = (posting
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .select(
                  id_col,
                  (F.log(F.lit(1.0)
                         + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                         / (F.col("df") + F.lit(0.5)))
                   * (F.col("tf") * (k1 + 1))
                   / (F.col("tf") + F.lit(k1)
                      * (1 - b + F.lit(b) * F.col("dl") / F.col("avgdl")))
                   ).alias("s"))
              .groupBy(id_col)
              # per-term contributions are deterministic scalars; summing
              # them as DECIMAL(38,12) makes the per-doc total independent
              # of partial-aggregation order, so the 6-dp round matches
              # the oracle's sequential fold exactly
              .agg(F.round(F.sum(F.round(F.col("s"), 12)
                                 .cast("decimal(38,12)")).cast("double"), 6)
                   .alias("score")))
    # top-k via distributed TakeOrdered (orderBy+limit), THEN rank the k
    # survivors — a global row_number window would drag every matching doc
    # into one partition, which for a common term is the corpus
    from pyspark.sql import Window as W

    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    rk = F.row_number().over(
        W.orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return top.withColumn("rank", rk).select(id_col, "score", "rank")


def rrf_fuse(rankings: list[DataFrame], k: int = 10, c: int = 60,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    ranked lists (each ``(id_col, ..., rank)``):
    ``rrf = Σ_lists 1/(c + rank)``, returning the fused top-k as
    ``(id_col, rrf_score, rank)``. The standard glue between the BM25 leg
    and an ANN leg — rank-based, so the legs' incomparable score scales
    never matter. Each leg is already top-k-sized, so the fusion runs on
    k·len(rankings) rows — driver-trivial at any corpus scale."""
    from functools import reduce

    from pyspark.sql import Window as W

    legs = [r.select(F.col(id_col),
                     (1.0 / (F.lit(c) + F.col("rank"))).alias("part"))
            for r in rankings]
    allp = reduce(lambda a, b: a.unionByName(b), legs)
    fused = (allp.groupBy(id_col)
             .agg(F.round(F.sum(F.round(F.col("part"), 12)
                                .cast("decimal(38,12)")).cast("double"), 6)
                  .alias("rrf_score")))
    top = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()) \
        .limit(k)
    rk = F.row_number().over(
        W.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()))
    return top.withColumn("rank", rk).select(id_col, "rrf_score", "rank")


def positional_index(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Positional postings ``(term, doc_id, pos)`` — the index layout
    phrase and proximity queries need (plain tf postings cannot verify
    adjacency). One map-side posexplode; write bucketed by term and a
    phrase query's scan touches only its terms' postings."""
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(_tokens(text_col)).alias("pos", "term"))
            .filter(F.col("term") != ""))


def phrase_search(docs: DataFrame, phrase: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  index: DataFrame | None = None) -> DataFrame:
    """Exact-phrase match via positional postings: ``(id_col,
    n_occurrences)`` for documents containing the query tokens
    CONSECUTIVELY. Each query term's postings are re-based to the
    phrase start (``pos - i``) and a start position where all ``m``
    terms land is a full occurrence — the classic positional-index
    intersection, expressed as one groupBy over the pruned postings
    (distinct terms count once per slot, so repeated-term phrases like
    "the the" need all slots individually).

    Pass a pre-built :func:`positional_index` to amortize the corpus
    tokenization across many queries; otherwise it is built inline.
    Scale: postings filter to the query terms map-side before the
    one shuffle on (doc, start)."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    idx = index if index is not None else positional_index(
        docs, text_col, id_col)
    pruned = idx.filter(F.col("term").isin(sorted(set(terms))))
    # one row per (query slot i, posting): slot i of the phrase matched at
    # start = pos - i. A start with all len(terms) distinct slots present
    # is an occurrence.
    slots = F.array(*[
        F.when(F.col("term") == t, F.lit(i)).otherwise(F.lit(None))
        for i, t in enumerate(terms)])
    hits = (pruned
            .select("doc_id", "pos",
                    F.explode(F.filter(slots, lambda x: x.isNotNull()))
                    .alias("slot"))
            .select("doc_id", F.col("slot"),
                    (F.col("pos") - F.col("slot")).alias("start")))
    occ = (hits.groupBy("doc_id", "start")
           .agg(F.count_distinct("slot").alias("n_slots"))
           .filter((F.col("n_slots") == len(terms)) & (F.col("start") >= 0)))
    return (occ.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .withColumnRenamed("doc_id", id_col))
