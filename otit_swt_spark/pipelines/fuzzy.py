"""Entity-resolution fuzzy joins: edit-distance matching via q-gram
blocking + Levenshtein verification — the record-linkage primitive
(merging catalogs, deduplicating customer/supplier names) that exact and
token-level joins cannot express.

Design for 100 TB:
- each side reduces map-side to its DISTINCT strings before anything else
  (names repeat heavily; the join is over the name domain, not the rows);
- candidate generation is a block join on shared character q-grams —
  never an all-pairs cross. Count bound: two strings within edit distance
  ``d`` share at least ``max(len) − q + 1 − d·q`` q-grams, so for strings
  of length >= ``q + d·q`` sharing >= 1 gram is GUARANTEED (no recall
  loss from blocking); shorter strings fall back to a whole-string gram;
- hot grams (stopword fragments like ``'the'``) are capped per side at
  ``cap`` entries (deterministic lowest strings) — the standard
  recall-for-boundedness trade, stated in the output contract;
- the length filter ``|len_a − len_b| <= d`` (a Levenshtein necessary
  condition) prunes before the verify;
- verification is the built-in ``levenshtein`` (JVM-side, and identical
  in DuckDB — the oracle replays the whole pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _gram_entries(df: DataFrame, col: str, q: int, cap: int,
                  side: str) -> DataFrame:
    """Distinct strings exploded to (gram, s), hot grams capped at ``cap``
    lowest strings per side."""
    from pyspark.sql import Window as W

    names = (df.select(F.col(col).alias("s"))
             .where(F.col(col).isNotNull()).distinct())
    low = F.lower(F.col("s"))
    count = F.greatest(F.length(low) - F.lit(q - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    grams = F.when(F.length(low) < q, F.array(low)).otherwise(
        F.transform(idx, lambda i: low.substr(i.cast("int"), F.lit(q))))
    exploded = (names.select("s", F.explode(grams).alias("gram"))
                .distinct())
    return (exploded.withColumn(
        "__rn", F.row_number().over(W.partitionBy("gram").orderBy("s")))
        .filter(F.col("__rn") <= cap)
        .select("gram", F.col("s").alias(side)))


def fuzzy_join_names(a: DataFrame, b: DataFrame, col_a: str, col_b: str,
                     max_distance: int = 2, q: int = 3,
                     cap: int = 64) -> DataFrame:
    """Distinct-name fuzzy join: ``(name_a, name_b, distance)`` for pairs
    within ``max_distance`` edits (case-insensitive). Blocking guarantees
    recall for names of length >= ``q·(max_distance + 1)`` whose shared
    grams survive the per-gram cap; join the result back to the row
    tables on the name to propagate ids."""
    ga = _gram_entries(a, col_a, q, cap, "name_a")
    gb = _gram_entries(b, col_b, q, cap, "name_b")
    cand = (ga.join(gb, "gram")
            .select("name_a", "name_b")
            .filter(F.abs(F.length("name_a") - F.length("name_b"))
                    <= max_distance)
            .distinct())
    dist = F.levenshtein(F.lower("name_a"), F.lower("name_b"))
    return (cand.select("name_a", "name_b", dist.alias("distance"))
            .filter(F.col("distance") <= max_distance))


def fuzzy_self_pairs(df: DataFrame, col: str, max_distance: int = 2,
                     q: int = 3, cap: int = 64) -> DataFrame:
    """Near-duplicate NAME pairs within one table: the self-join variant
    with the canonical ``name_a < name_b`` ordering (drops self-matches
    and mirrored pairs) — the name-dedup pass of entity resolution."""
    out = fuzzy_join_names(df, df, col, col, max_distance, q, cap)
    return out.filter(F.col("name_a") < F.col("name_b"))
