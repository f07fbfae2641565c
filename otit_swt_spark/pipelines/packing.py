"""Sequence packing for LM training: place every document at a token
offset inside a fixed-budget training pack (the concat-then-chunk recipe —
documents are laid end to end in a deterministic order and the stream is
cut every ``budget`` tokens, so a document whose span crosses a cut is
split across two packs, exactly like GPT-style pretraining batches).

Scale shape: one map-side md5 shard assignment + token count, then ONE
window cumulative sum per shard — each shard is an independent token
stream, so the sort parallelism equals ``n_shards`` and no global
single-partition scan exists. Size ``n_shards`` so a shard's rows fit an
executor (at 100 TB: tens of thousands of shards). Pack identity is
``(shard, pack_idx)`` — globally unique without any cross-shard
coordination, and stable across runs/engines because both the shard and
the intra-shard order derive from md5 of the document key.

Reference: this operator has no twin in /root/reference (a query engine,
not a training-data pipeline); it is part of the north-star LLM-pipeline
surface alongside pipelines.sampling (same md5-range determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from otit_swt_spark.pipelines.sampling import hash_shard
from otit_swt_spark.pipelines.textstats import n_tokens

_FFD_OUT = "{key} long, shard int, n_tokens long, pack_idx long"


def pack_sequences(df: DataFrame, budget: int, key_col: str = "doc_id",
                   text_col: str = "text", n_shards: int = 8,
                   salt: str = "pack") -> DataFrame:
    """Assign each document a training-pack slot.

    Returns ``df``'s key plus ``shard``, ``n_tokens``, ``token_offset``
    (the document's start position in its shard's concatenated token
    stream), ``pack_idx`` (= ``token_offset // budget``: the pack holding
    the document's first token) and ``spans_packs`` (true when the
    document crosses a pack boundary and will be split by the chunker).

    Deterministic: shard and intra-shard order are md5-derived from the
    key, so the layout is reproducible across runs and engines.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = df.select(
        F.col(key_col),
        n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    sharded = hash_shard(toks, key_col, n_shards, salt=salt)
    order_key = F.md5(F.concat(F.lit(salt + ":o"), F.col(key_col).cast("string")))
    w = (W.partitionBy("shard")
         .orderBy(order_key, F.col(key_col))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum("n_tokens").over(w)
    return (sharded
            .withColumn("token_offset", (cum - F.col("n_tokens")))
            .withColumn("pack_idx", F.floor(F.col("token_offset") / budget))
            .withColumn(
                "spans_packs",
                F.col("token_offset") + F.col("n_tokens") - 1
                >= (F.col("pack_idx") + 1) * budget)
            .select(key_col, "shard", "n_tokens", "token_offset",
                    "pack_idx", "spans_packs"))


def pack_sequences_nosplit(df: DataFrame, budget: int,
                           key_col: str = "doc_id", text_col: str = "text",
                           n_shards: int = 8, salt: str = "pack",
                           ) -> DataFrame:
    """No-split training packs via first-fit-decreasing bin packing —
    the SFT/instruction-tuning layout where a document must stay whole
    (vs :func:`pack_sequences`' concat-then-chunk, which splits at pack
    boundaries). Documents longer than ``budget`` get a singleton pack.

    FFD is inherently sequential, so it runs per md5 shard inside an
    Arrow ``applyInPandas`` — each shard's pack list fits a worker, the
    shards pack in parallel, and ``(shard, pack_idx)`` is globally
    unique. Deterministic: order within a shard is (tokens desc, md5
    order key), both derived from the key.

    Output: ``key, shard, n_tokens, pack_idx``; pytest asserts the FFD
    invariants (no pack exceeds the budget except oversized singletons;
    assignment deterministic under repartitioning). The inner first-fit
    scan is O(open packs) per document — size ``n_shards`` so a shard's
    pack count stays small (FFD's 11/9·OPT quality bound holds per
    shard).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = df.select(
        F.col(key_col),
        n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    sharded = hash_shard(toks, key_col, n_shards, salt=salt)
    okey = F.md5(F.concat(F.lit(salt + ":o"), F.col(key_col).cast("string")))
    staged = sharded.withColumn("__okey", okey)

    def ffd(pdf):
        pdf = pdf.sort_values(["n_tokens", "__okey"],
                              ascending=[False, True]).reset_index(drop=True)
        loads: list[int] = []   # current token load per open pack
        assign = []
        for n in pdf["n_tokens"].tolist():
            placed = None
            for i, load in enumerate(loads):   # first fit
                if load + n <= budget:
                    placed = i
                    loads[i] = load + n
                    break
            if placed is None:
                placed = len(loads)
                loads.append(n)
            assign.append(placed)
        pdf["pack_idx"] = assign
        return pdf.drop(columns=["__okey"])

    return (staged.groupBy("shard")
            .applyInPandas(ffd, _FFD_OUT.format(key=key_col)))


def pack_sequences_nextfit(df: DataFrame, budget: int,
                           key_col: str = "doc_id", text_col: str = "text",
                           n_shards: int = 8, salt: str = "pack",
                           ) -> DataFrame:
    """No-split training packs with NEXT-FIT placement: documents stay
    whole and pack in the deterministic md5 stream order — the one-pass
    streaming packer (O(1) state per shard vs FFD's open-pack scan), and
    the only no-split discipline a SQL engine replays exactly (the oracle
    advances the same one-row state machine as a recursive CTE).
    Oversized documents occupy their own pack; the next document always
    opens a fresh one. Output: ``key, shard, n_tokens, pack_idx``."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = df.select(
        F.col(key_col),
        n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    sharded = hash_shard(toks, key_col, n_shards, salt=salt)
    okey = F.md5(F.concat(F.lit(salt + ":o"), F.col(key_col).cast("string")))
    staged = sharded.withColumn("__okey", okey)

    def nextfit(pdf):
        pdf = pdf.sort_values(["__okey", key_col]).reset_index(drop=True)
        bin_idx, load = 0, None
        assign = []
        for n in pdf["n_tokens"].tolist():
            if load is None or load + n > budget:
                if load is not None:
                    bin_idx += 1
                load = n
            else:
                load += n
            assign.append(bin_idx)
        pdf["pack_idx"] = assign
        return pdf.drop(columns=["__okey"])

    return (staged.groupBy("shard")
            .applyInPandas(nextfit, _FFD_OUT.format(key=key_col)))
