"""Runnable example: end-to-end training-corpus preparation.

Reads the synthetic documents table, runs the full prep recipe (text
normalization, PII scrub, repetition filter, quality filter + exact dedup,
train/test decontamination, char-trigram LM filter, chunking), selects the
best chunks under a token budget, and writes the result as deterministic
hash shards.

    python examples/corpus_prep.py [sf_dir]   # default /root/testdata/sf0.01
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from otit_swt_spark.pipelines.corpus import prepare_corpus_full  # noqa: E402
from otit_swt_spark.pipelines.sampling import write_training_shards  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402


def main() -> None:
    from otit_swt_spark.pipelines.textstats import normalize_text

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example_corpus", cpus=8)
    # normalize FIRST so formatting variants collapse in every later
    # hash-based stage (dedup, decontamination)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", normalize_text(F.col("text")).alias("text"))

    # a held-out slice plays the benchmark (decontamination) and another
    # the LM reference corpus
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    lm_ref = docs.filter(F.col("doc_id") % 2 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)

    chunks = prepare_corpus_full(
        train, benchmark=benchmark, lm_reference=lm_ref,
        min_tokens=10, min_stopword_ratio=0.0, chunk_chars=200,
        decontam_n=8, min_lm_score=-3.6)

    # keep the longest chunks until the token budget is exhausted (greedy,
    # bucketed two-phase — no global window)
    from otit_swt_spark.pipelines.sampling import token_budget_select

    chunks = chunks.withColumn(
        "chunk_id", F.concat_ws(":", "doc_id", "chunk_idx"))
    picked = token_budget_select(chunks, 5_000, F.length("chunk"),
                                 id_col="chunk_id", text_col="chunk")
    chunks = chunks.join(picked.select("chunk_id"), "chunk_id")

    out = os.path.join(tempfile.mkdtemp(prefix="corpus_prep_"), "shards")
    write_training_shards(chunks, out, key_col="chunk_id", n_shards=4,
                          order_col="chunk_id")

    back = spark.read.parquet(out)
    print(f"prepared chunks: {back.count()} "
          f"(from {train.count()} candidate docs) -> {out}")
    back.groupBy("shard").count().orderBy("shard").show()


if __name__ == "__main__":
    main()
