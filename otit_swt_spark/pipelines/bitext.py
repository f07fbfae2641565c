"""Bitext / parallel-corpus candidate mining — the multilingual curation
stage that pairs documents which are plausibly TRANSLATIONS of each
other, feeding MT / multilingual pretraining mixes. Classic public
recipe (Gale-Church 1993 length statistics + translation-invariant
lexical anchors, as used by paracrawl-style pipelines): candidate pairs
come from a cheap blocking key (same URL stripped of its language
segment, same article id), then survive a length-ratio window and score
by overlap of anchors that survive translation unchanged — digit runs
(dates, quantities, ids).

Spark-first shape: blocking is an equi-join on the caller's key (the
caller supplies a TIGHT key — fan-out per key is the cost model, stated
below), length features are pure column expressions, and anchor overlap
is computed by EXPLODING distinct anchors and re-joining on
``(key, anchor)`` — plain grouped integer counts, no array
set-operations, so the identical plan runs in any SQL engine and scales
as a hash join instead of per-row list intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: anchors = digit runs: translation-invariant across languages and
#: cheap to agree on cross-engine (no tokenizer dependency)
_ANCHOR_RE = "[0-9]+"


def bitext_candidates(docs: DataFrame,
                      id_col: str = "doc_id",
                      key_col: str = "key",
                      lang_col: str = "lang",
                      text_col: str = "text",
                      ratio_low: float = 0.5,
                      ratio_high: float = 2.0,
                      max_docs_per_key: int | None = None) -> DataFrame:
    """Cross-language translation-pair candidates: for every pair of
    documents sharing ``key_col`` with ``lang_a < lang_b``, emit
    ``(key, id_a, id_b, lang_a, lang_b, len_ratio, anchors_a, anchors_b,
    anchors_shared, anchor_jaccard)``, keeping pairs whose character
    length ratio lies in ``[ratio_low, ratio_high]`` (the Gale-Church
    screen; translations have correlated lengths).

    ``anchor_jaccard`` is |shared| / |union| over each document's
    DISTINCT digit-run anchors (0.0 when neither side has anchors — no
    evidence, not perfect evidence). Scale: one self-equi-join on the
    blocking key plus one ``(key, anchor)`` equi-join — cost is
    O(Σ_key n_a·n_b), so the caller's key must bound per-key document
    counts (an article id or canonical URL, never a whole domain);
    a pair mass explosion is a blocking-key bug, not a shuffle bug.

    ``max_docs_per_key`` is the guard rail for exactly that bug: when
    set, only the ``max_docs_per_key`` lowest-id documents of each key
    participate (the hub-clip pattern graphalgo.py uses for
    high-degree vertices), so one degenerate key — an empty string, a
    boilerplate URL — degrades DETERMINISTICALLY to a bounded O(k²)
    instead of quadratic pair mass. Default None keeps the operator
    exact."""
    base = docs.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("len"),
        F.col(text_col).alias("__t"))
    if max_docs_per_key is not None:
        k = int(max_docs_per_key)
        if k < 2:
            raise ValueError("max_docs_per_key must be >= 2 "
                             "(a pair needs two documents)")
        from pyspark.sql import Window as W

        rn = F.row_number().over(
            W.partitionBy("key").orderBy("id"))
        base = (base.withColumn("__rn", rn)
                .where(F.col("__rn") <= k).drop("__rn"))
    a = base.select("key", F.col("id").alias("id_a"),
                    F.col("lang").alias("lang_a"),
                    F.col("len").alias("len_a"))
    b = base.select("key", F.col("id").alias("id_b"),
                    F.col("lang").alias("lang_b"),
                    F.col("len").alias("len_b"))
    ratio = F.col("len_a").cast("double") / F.col("len_b").cast("double")
    pairs = (a.join(b, "key")
             .where(F.col("lang_a") < F.col("lang_b"))
             .where((F.col("len_b") > 0)
                    & (ratio >= float(ratio_low))
                    & (ratio <= float(ratio_high))))

    anchors = (base.select(
        "key", "id",
        F.explode(F.array_distinct(
            F.regexp_extract_all(F.col("__t"), F.lit(_ANCHOR_RE), F.lit(0))
        )).alias("anchor")))
    n_anchors = anchors.groupBy("id").agg(F.count(F.lit(1)).alias("na"))
    shared = (anchors.alias("x")
              .join(anchors.alias("y"),
                    (F.col("x.key") == F.col("y.key"))
                    & (F.col("x.anchor") == F.col("y.anchor"))
                    & (F.col("x.id") != F.col("y.id")))
              .groupBy(F.col("x.id").alias("id_a"),
                       F.col("y.id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("shared")))

    out = (pairs
           .join(n_anchors.withColumnRenamed("id", "id_a")
                 .withColumnRenamed("na", "anchors_a"), "id_a", "left")
           .join(n_anchors.withColumnRenamed("id", "id_b")
                 .withColumnRenamed("na", "anchors_b"), "id_b", "left")
           .join(shared, ["id_a", "id_b"], "left"))
    aa = F.coalesce(F.col("anchors_a"), F.lit(0))
    bb = F.coalesce(F.col("anchors_b"), F.lit(0))
    ss = F.coalesce(F.col("shared"), F.lit(0))
    union = aa + bb - ss
    jac = F.when(union == 0, F.lit(0.0)).otherwise(
        ss.cast("double") / union.cast("double"))
    return out.select(
        "key", "id_a", "id_b", "lang_a", "lang_b",
        (F.round(ratio, 6) + F.lit(0.0)).alias("len_ratio"),
        aa.cast("long").alias("anchors_a"),
        bb.cast("long").alias("anchors_b"),
        ss.cast("long").alias("anchors_shared"),
        (F.round(jac, 6) + F.lit(0.0)).alias("anchor_jaccard"))
