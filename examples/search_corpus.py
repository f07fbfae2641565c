"""Runnable example: lexical + hybrid retrieval over the documents table —
BM25 top-k, exact-phrase search via positional postings, a standing
inverted index, and reciprocal-rank fusion of the BM25 leg with an
embedding-cosine leg.

    python examples/search_corpus.py [sf_dir]   # default /root/testdata/sf0.01
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window, functions as F  # noqa: E402

from otit_swt_spark.pipelines.search import (  # noqa: E402
    bm25_topk,
    build_inverted_index,
    phrase_search,
    rrf_fuse,
)
from otit_swt_spark.pipelines.similarity import cosine  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example_search", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    print("== BM25 top-5: 'spark join window'")
    bm25_topk(docs, "spark join window", k=5).show(truncate=False)

    print("== exact phrase 'value table' (first 5 docs by occurrences)")
    phrase_search(docs, "value table") \
        .orderBy(F.desc("n_occurrences"), "doc_id").show(5)

    print("== inverted index: postings for 'agg'")
    build_inverted_index(docs).filter(F.col("term") == "agg") \
        .orderBy("doc_id").show(5)

    print("== hybrid: BM25 leg + cosine leg fused with RRF")
    bleg = bm25_topk(docs, "spark join window", k=20)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding").cast("array<double>"),
                       F.col("qv").cast("array<double>")), 6).alias("cs"))
    ctop = scored.orderBy(F.col("cs").desc(), "doc_id").limit(20)
    cleg = ctop.withColumn("rank", F.row_number().over(
        Window.orderBy(F.col("cs").desc(), F.col("doc_id"))))
    rrf_fuse([bleg, cleg], k=10).show(truncate=False)


if __name__ == "__main__":
    main()
