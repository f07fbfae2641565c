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

import pandas as pd
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


def token_sets(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, tok) pairs: each document reduced to its token SET
    (whitespace tokens, lowercased) — the input relation for exact
    set-similarity joins."""
    return (df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct())


def _ssjoin_pairs(toks: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs over a (id, tok) set relation
    — the shared core of :func:`ssjoin_jaccard` (all rows) and
    :func:`ssjoin_distinct_sets` (identical-set representatives).

    The token column is immediately replaced by its xxhash64 (guide
    §2.3 — shuffle 8-byte keys, not multi-word gram strings): every
    downstream use of a token — the df-frequency key, the ascending
    (df, tok) prefix order, the prefix-postings equi-join, the verify
    ``array_intersect`` — needs only token IDENTITY and *some*
    consistent total order (the prefix principle is lossless under any
    global order), and no token reaches the output. r14 measured the
    full truth pass 4.06 -> (see OPTIMIZATION_r14.md) from the freq
    join, per-doc sort and verify join all moving longs instead of
    strings. A 64-bit collision (~n²/2⁶⁵) could in principle merge two
    grams; at 10⁹ distinct grams that is ~3% chance of ONE merged pair
    corpus-wide — far below the banding noise the harness measures."""
    toks = toks.select("id", F.xxhash64("tok").alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # materialized once (lazy localCheckpoint, no CacheManager entry):
    # three consumers read this frame — the prefix postings and both
    # sides of the verification join — and each would otherwise rerun
    # the tokenize + frequency-join + per-doc sort pipeline
    ordered = (toks.join(freq, "tok")
               .groupBy("id")
               .agg(F.sort_array(F.collect_list(F.struct("df", "tok")))
                    .alias("o"))
               .select("id",
                       F.transform("o", lambda x: x["tok"]).alias("toks"),
                       F.size("o").alias("sz"))
               .localCheckpoint(eager=False))
    prefix_len = (F.col("sz")
                  - F.ceil(F.lit(threshold) * F.col("sz")).cast("int")
                  + F.lit(1))
    prefix = ordered.select(
        "id", "sz", F.explode(F.slice("toks", F.lit(1), prefix_len))
        .alias("tok"))
    pa = prefix.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"),
                       "tok")
    pb = prefix.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"),
                       "tok")
    cand = (pa.join(pb, "tok")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.least("sz_a", "sz_b")
                    >= F.lit(threshold) * F.greatest("sz_a", "sz_b"))
            .select("id_a", "id_b").distinct())
    ta = ordered.select(F.col("id").alias("id_a"),
                        F.col("toks").alias("toks_a"),
                        F.col("sz").alias("sz_a"))
    tb = ordered.select(F.col("id").alias("id_b"),
                        F.col("toks").alias("toks_b"),
                        F.col("sz").alias("sz_b"))
    ov = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = ov.cast("double") / (F.col("sz_a") + F.col("sz_b") - ov)
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def ssjoin_jaccard(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   threshold: float = 0.5) -> DataFrame:
    """EXACT set-similarity self-join: all pairs whose token-set Jaccard
    similarity is >= ``threshold``, via prefix filtering (Chaudhuri et
    al. 2006 / PPJoin family) — the lossless complement to the
    probabilistic MinHash pipeline: no false negatives, no false
    positives, every emitted ``jaccard`` exact.

    Prefix principle: order each document's tokens by ascending global
    document frequency (rarest first, token as tiebreak); two sets with
    Jaccard >= t MUST share a token within each other's first
    ``|T| - ceil(t*|T|) + 1`` tokens, so the candidate join runs only on
    the prefix postings — dominated by RARE tokens by construction (the
    hottest tokens sort last and rarely enter a prefix).

    Scale shape: one vocabulary aggregate (token -> doc frequency), one
    per-doc sort of its own tokens (map-side after a doc-keyed shuffle),
    a prefix-postings equi-join on token, then one verify join back to
    the token arrays. Shuffles key on uniform ids/tokens. Length filter
    ``min(sz) >= t * max(sz)`` prunes before verification. Honest bound:
    m documents with IDENTICAL token sets emit m(m-1)/2 pairs — that is
    the TRUE result set (exact semantics), not a blocking failure; use
    :func:`ssjoin_distinct_sets` when identical-copy mass is expected."""
    return _ssjoin_pairs(token_sets(df, text_col, id_col), threshold)


def ssjoin_distinct_sets(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         threshold: float = 0.5) -> DataFrame:
    """Exact set-similarity join over DISTINCT token sets: collapse rows
    with identical token sets to one representative (minimum id) before
    the prefix-filtered join — the composition :func:`ssjoin_jaccard`'s
    docstring prescribes for duplicate-heavy corpora. On a corpus where
    m rows share a set, the all-rows join's output is m²-shaped by
    definition; over representatives it is (distinct sets)²-shaped at
    worst and the identical-set mass costs ONE groupBy. Returned pairs
    are between representatives; join back on the set digest to fan out
    to row ids when needed."""
    toks = token_sets(df, text_col, id_col)
    reps = (toks.groupBy("id")
            .agg(F.sort_array(F.collect_list("tok")).alias("ts"))
            .groupBy("ts").agg(F.min("id").alias("id")))
    rep_toks = reps.select("id", F.explode("ts").alias("tok"))
    return _ssjoin_pairs(rep_toks, threshold)


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity, matching DuckDB's
    ``jaro_winkler_similarity`` BIT-FOR-BIT (differentially fuzzed on
    80k random + realistic string pairs, 0 mismatches): empty string
    => 0.0 (even against empty), match window floor-clamped at 0,
    transpositions halved by integer division, Winkler prefix boost
    (scale 0.1, prefix cap 4) applied only above jaro 0.7."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    match_dist = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > 0.7:
        pre = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pre += 1
        j += pre * 0.1 * (1 - j)
    return j


def jaro_winkler_pairs(df: DataFrame, col: str, min_sim: float = 0.85,
                       q: int = 3, cap: int = 64) -> DataFrame:
    """Near-duplicate name pairs under Jaro-Winkler similarity —
    the record-linkage scorer that rewards shared prefixes and
    tolerates transpositions where plain edit distance over-penalizes.
    Same q-gram blocking (hot grams capped) as :func:`fuzzy_self_pairs`;
    the verify is an Arrow-batched pandas UDF replicating DuckDB's
    ``jaro_winkler_similarity`` exactly, so the oracle replays blocking
    AND scores bit-for-bit. Recall contract: a pair surfaces iff it
    shares at least one (cap-surviving) q-gram — for high-JW pairs that
    is near-always true (they share long character runs), but unlike
    the Levenshtein variant there is no hard guarantee."""
    @F.pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_jaro_winkler_py(x, y)
                          for x, y in zip(a, b)], dtype="float64")

    ga = _gram_entries(df, col, q, cap, "name_a")
    gb = _gram_entries(df, col, q, cap, "name_b")
    cand = (ga.join(gb, "gram")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b").distinct())
    sim = _jw(F.lower("name_a"), F.lower("name_b"))
    return (cand.withColumn("__s", sim)
            .filter(F.col("__s") >= min_sim)
            .select("name_a", "name_b",
                    F.round("__s", 6).alias("jw_sim")))


def er_golden_records(df: DataFrame, name_col: str, key_col: str,
                      max_distance: int = 2, q: int = 3,
                      cap: int = 64) -> DataFrame:
    """End-to-end entity resolution: block (:func:`_gram_entries`
    q-grams) -> match (:func:`fuzzy_self_pairs` Levenshtein) ->
    cluster (min-label connected components over the match graph,
    ``dedup.dedup_clusters`` pointer jumping) -> survive (one GOLDEN
    RECORD per entity cluster: the row with the minimum ``key_col``,
    the deterministic survivorship rule). Names with no fuzzy match
    are their own singleton entity. Output: ``(cluster, survivor_key,
    survivor_name, n_rows, n_names)`` — ``cluster`` is the
    lexicographic minimum name in the entity.

    Scale shape is the sum of its parts: capped gram blocking (never
    all-pairs), log-diameter pointer jumping, and a single grouped
    argmin at the end. The oracle replays blocking, matching, a
    recursive-CTE closure, and min_by survivorship."""
    from otit_swt_spark.pipelines.dedup import dedup_clusters

    pairs = fuzzy_self_pairs(df, name_col, max_distance, q, cap)
    comps = dedup_clusters(pairs.select(F.col("name_a").alias("id_a"),
                                        F.col("name_b").alias("id_b")))
    rows = (df.select(F.col(name_col).alias("__nm"),
                      F.col(key_col).alias("__k"))
            .where(F.col(name_col).isNotNull()))
    labeled = (rows.join(comps, rows["__nm"] == comps["id"], "left")
               .select("__nm", "__k",
                       F.coalesce("cluster", "__nm").alias("cluster")))
    # survivor_name: min over (key, name) struct, NOT min_by(name, key) —
    # when key_col values tie within a cluster min_by's pick is
    # engine-arbitrary; the struct's lexicographic (key, name) order is
    # deterministic and bit-replayable against the DuckDB oracle
    surv = F.min(F.struct(F.col("__k").alias("k"),
                          F.col("__nm").alias("nm")))
    return (labeled.groupBy("cluster")
            .agg(F.min("__k").alias("survivor_key"),
                 surv["nm"].alias("survivor_name"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("__nm").alias("n_names")))
