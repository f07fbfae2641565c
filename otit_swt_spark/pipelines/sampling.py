"""Deterministic sampling and splitting for training corpora.

Random sampling is useless for reproducible data pipelines — re-runs must
pick the SAME rows. These operators hash a stable key (id or content) and
threshold the hash, so membership is a pure function of the row: stable
across runs, machines, partitionings, and engines (md5 is standard, so a
SQL engine computes the identical sample). Map-side only — no shuffle, no
state, trivially parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_SPACE = 16 ** 8  # first 8 md5 hex chars ~ uniform 32-bit value


def _hex_threshold(fraction: float) -> str:
    """Lowercase 8-hex-char threshold such that P(prefix < threshold) ==
    fraction for a uniform hash. String comparison on fixed-width lowercase
    hex is order-identical to the numeric comparison."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _hash_prefix(col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by hashing
    ``key_col`` (+ optional salt for independent re-draws)."""
    if fraction >= 1.0:
        # The hex threshold saturates at 'ffffffff' and the comparison is
        # strict, which would drop rows whose hash prefix is exactly
        # 'ffffffff' — fraction 1.0 must keep everything.
        _hex_threshold(fraction)  # still validate the range
        return df
    return df.filter(_hash_prefix(F.col(key_col), salt)
                     < F.lit(_hex_threshold(fraction)))


def mixture_sample(df: DataFrame, group_col: str, fractions: dict[str, float],
                   key_col: str, default_fraction: float = 0.0,
                   salt: str = "") -> DataFrame:
    """Deterministic per-group sampling rates — the corpus-mixing op
    (down-weight web crawl, keep all books, ...): each row is kept iff its
    salted key hash clears its GROUP's threshold. Pure map-side CASE over
    the hash prefix; same stability guarantees as :func:`hash_sample`.
    Groups absent from ``fractions`` use ``default_fraction``. Fractions
    above 1 are capped at keep-all (upsampling needs row replication —
    compose with an explode upstream)."""
    h = _hash_prefix(F.col(key_col), salt)
    expr = None
    for grp, frac in fractions.items():
        keep = (F.lit(True) if frac >= 1.0
                else h < F.lit(_hex_threshold(max(frac, 0.0))))
        cond = F.col(group_col) == grp
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    default_keep = (F.lit(True) if default_fraction >= 1.0
                    else h < F.lit(_hex_threshold(max(default_fraction, 0.0))))
    expr = default_keep if expr is None else expr.otherwise(default_keep)
    return df.filter(expr)


def weight_sample(df: DataFrame, key_col: str, prob: Column,
                  salt: str = "") -> DataFrame:
    """Deterministic per-ROW Bernoulli sampling: keep each row iff its
    salted key hash clears the row's own probability ``prob`` (a Column
    in [0, 1] — a quality score, an importance weight, a per-domain
    rate). Generalizes :func:`hash_sample` (constant fraction) and
    :func:`mixture_sample` (per-group fraction) to fully row-dependent
    keep probabilities while staying a pure map-side codegen'd filter —
    reproducible across runs, engines, and partitionings.

    The probability is floored onto the same 2^32 hash grid the constant
    samplers use (``floor(p * 2^32)`` → 8-hex threshold), so any SQL
    engine replays membership exactly."""
    h = _hash_prefix(F.col(key_col), salt)
    thresh = F.lower(F.lpad(F.hex(
        F.floor(F.greatest(F.lit(0.0), F.least(prob, F.lit(1.0)))
                * F.lit(float(_HEX_SPACE))).cast("long")), 8, "0"))
    return df.filter((prob >= 1.0) | (h < thresh))


def hash_shard(df: DataFrame, key_col: str, n_shards: int,
               salt: str = "", shard_col: str = "shard") -> DataFrame:
    """Assign every row a deterministic shard in ``[0, n_shards)`` by
    splitting the md5 space into equal string ranges — the global-shuffle
    primitive for training-data export: shard membership is a pure function
    of the key (stable across runs/engines), shards are balanced in
    expectation, and ``salt`` re-deals the assignment for a fresh epoch.

    Pure map-side (a CASE chain over the hash prefix, codegen'd); the
    physical shuffle happens only when a writer partitions by the shard
    column."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = _hash_prefix(F.col(key_col), salt)
    expr = None
    for i in range(n_shards - 1):
        cond = h < F.lit(_hex_threshold((i + 1) / n_shards))
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    expr = (F.lit(0) if expr is None else expr.otherwise(F.lit(n_shards - 1)))
    return df.withColumn(shard_col, expr.cast("int"))


def shard_thresholds_sql(n_shards: int, key_expr: str, salt: str = "") -> str:
    """The DuckDB/ANSI twin of :func:`hash_shard`'s CASE chain (used by the
    correctness oracle; kept next to the implementation so the two stay in
    lockstep)."""
    h = f"substr(md5('{salt}' || {key_expr}), 1, 8)"
    whens = "".join(
        f" WHEN {h} < '{_hex_threshold((i + 1) / n_shards)}' THEN {i}"
        for i in range(n_shards - 1))
    return f"CASE{whens} ELSE {n_shards - 1} END"


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int, salt: str = "",
                          order_col: str | None = None) -> None:
    """Export a corpus as ``path/shard=N/`` parquet directories with a
    deterministic global assignment and (optionally) a deterministic order
    within each shard — reproducible training input at any scale. One
    shuffle (on the shard column); readers consume shards independently."""
    sharded = hash_shard(df, key_col, n_shards, salt)
    out = sharded.repartition(n_shards, F.col("shard"))
    if order_col is not None:
        out = out.sortWithinPartitions("shard", order_col)
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def stratified_sample(df: DataFrame, strata_cols: list[str], n_per_stratum: int,
                      key_col: str, salt: str = "") -> DataFrame:
    """Deterministic fixed-size sample per stratum: the ``n_per_stratum``
    rows with the smallest salted key hash within each strata group — a
    uniform draw that is reproducible across runs and engines, and stable
    per row under stratum growth only in expectation (unlike
    :func:`hash_sample`, a fixed-SIZE guarantee requires ranking).

    One shuffle on the strata columns; rank via row_number over the hash
    order. For pathologically hot strata at extreme scale, pre-filter with
    ``hash_sample`` at a few× the expected fraction first so the per-
    stratum sort stays small — the composition stays deterministic."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    from pyspark.sql import Window

    h = _hash_prefix(F.col(key_col), salt)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum)
            .drop("__rn"))


def hash_split(df: DataFrame, key_col: str,
               weights: dict[str, float] | None = None,
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Assign every row to a named split (train/val/test by default) by
    hash threshold — disjoint, exhaustive, reproducible, and stable under
    data growth (a row's split never changes when other rows are added)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _hash_prefix(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(split_col, expr)


def temperature_sample(df: DataFrame, group_col: str, key_col: str,
                       tau: float = 0.5, target_fraction: float = 0.5,
                       salt: str = "") -> DataFrame:
    """Temperature-flattened corpus mixing (the multilingual/multi-source
    LLM recipe): source weights w_i = n_i^tau / sum n_j^tau, so tau=1
    keeps natural proportions and tau->0 equalizes sources; each source
    keeps min(1, target_rows * w_i / n_i) of its rows, selected by the
    same deterministic md5 grid as :func:`hash_sample`.

    The per-source fraction is DERIVED IN THE PLAN from the tiny
    (group, count) aggregate (broadcast back — no driver collect), so the
    sample stays a pure function of (row, tau, target_fraction, salt) that
    any SQL engine reproduces exactly: the hex threshold is computed with
    the same floor/least arithmetic on both sides."""
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tw = F.pow(F.col("__n").cast("double"), F.lit(float(tau)))
    totals = (sizes.select(
        F.sum(tw).alias("__tw_sum"),
        F.sum("__n").alias("__n_total")))
    frac = F.least(
        F.lit(1.0),
        (F.lit(float(target_fraction)) * F.col("__n_total") *
         (tw / F.col("__tw_sum"))) / F.col("__n"))
    # 8-hex-char threshold with the exact _hex_threshold arithmetic:
    # least(floor(frac * 16^8), 16^8 - 1) rendered as zero-padded hex
    thr_int = F.least(F.floor(frac * F.lit(float(_HEX_SPACE))).cast("long"),
                      F.lit(_HEX_SPACE - 1))
    thresholds = (sizes.crossJoin(F.broadcast(totals))
                  .select(group_col,
                          F.lpad(F.lower(F.hex(thr_int)), 8, "0")
                          .alias("__thr")))
    # a source whose boosted share clamps to keep-all saturates the
    # threshold at 'ffffffff'; the strict < would still drop rows whose
    # hash prefix is exactly 'ffffffff' (the same edge hash_sample guards
    # with its fraction>=1.0 early return), so saturation means keep-all
    return (df.join(F.broadcast(thresholds), group_col)
            .filter((F.col("__thr") == F.lit("ffffffff"))
                    | (_hash_prefix(F.col(key_col), salt) < F.col("__thr")))
            .drop("__thr"))


def curriculum_deciles(df: DataFrame, score, group_col: str,
                       id_col: str, n_buckets: int = 10) -> DataFrame:
    """Curriculum-ordering metadata: rank rows easiest-first (``score``
    descending, id ascending) WITHIN each group and cut each group into
    ``n_buckets`` equal difficulty bands — (id, group, rank, bucket).
    Grouped windows parallelize across groups (a global total order would
    serialize into one partition); training schedules consume the bands
    per-source and interleave."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("__score"),
                                              F.col(id_col))
    cnt = Window.partitionBy(group_col)
    return (df.select(id_col, group_col, score.alias("__score"))
            .withColumn("rank", F.row_number().over(w))
            .withColumn("bucket",
                        F.floor((F.col("rank") - 1) * n_buckets /
                                F.count(F.lit(1)).over(cnt)).cast("int"))
            .select(id_col, group_col, "rank", "bucket"))


def epoch_upsample(df: DataFrame, group_col: str,
                   epochs: dict[str, int],
                   default_epochs: int = 1) -> DataFrame:
    """Materialize a mixture plan as whole-pass replication: every row of
    group g appears ``epochs[g]`` times (``default_epochs`` otherwise),
    tagged with a 1-based ``epoch`` index so downstream sharding/shuffling
    can separate the copies deterministically. Groups mapped to 0 epochs
    are dropped. This is how per-source weights become actual training
    passes (e.g. Wikipedia x3, CommonCrawl x1).

    Map-side explode from a literal map — zero shuffle, replication factor
    explicit and bounded, any scale."""
    pairs: list[Column] = []
    for g, e in epochs.items():
        pairs += [F.lit(g), F.lit(int(e))]
    e = F.coalesce(F.create_map(*pairs)[F.col(group_col)],
                   F.lit(int(default_epochs)))
    # sequence(1, 0) would generate a DESCENDING [1, 0] rather than an
    # empty array, so 0-epoch groups need the explicit empty branch
    idx = F.when(e >= 1, F.sequence(F.lit(1), e)).otherwise(
        F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(idx))


def token_budget_select(df: DataFrame, budget_tokens: int, score: Column,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = 1024) -> DataFrame:
    """Greedy data selection under a token budget: admit documents in
    (score desc, id asc) order while the running token total of everything
    admitted BEFORE them is still under the budget — the standard knapsack
    relaxation for "best N tokens" data curation.

    The naive form is a global-order window cumsum, which Spark would run
    in a single partition. Instead, two exactly-equivalent phases:
    quantize the score into ``n_buckets`` range buckets (one tiny min/max
    job); aggregate per-bucket token totals (n_buckets rows) and
    prefix-sum THAT; then every document's global running total =
    broadcast bucket prefix + a within-bucket window cumsum. Bucketing by
    score range keeps the composite order identical to the global
    (score desc, id) order, so the result matches the naive window (and
    the SQL oracle) row-for-row while the only windows are per-bucket.

    Returns (id_col, n_tok) for the admitted documents. Rows whose score
    is NULL are excluded (they have no position in the greedy order)."""
    from pyspark.sql import Window as W

    from otit_swt_spark.pipelines.textstats import n_tokens

    scored = df.select(F.col(id_col), score.alias("__s"),
                       n_tokens(F.col(text_col)).alias("n_tok"))
    lo, hi = scored.agg(F.min("__s"), F.max("__s")).first()
    if lo is None:
        return scored.select(id_col, "n_tok").limit(0)
    width = (float(hi) - float(lo)) / n_buckets or 1.0
    b = F.least(F.floor((F.col("__s") - F.lit(float(lo))) / F.lit(width)),
                F.lit(n_buckets - 1)).cast("int")
    bucketed = scored.withColumn("__b", b)
    # tiny frame: one row per non-empty bucket; the single-partition window
    # here is over <= n_buckets rows, not the corpus
    wb = W.orderBy(F.desc("__b")).rowsBetween(W.unboundedPreceding, -1)
    prefix = (bucketed.groupBy("__b").agg(F.sum("n_tok").alias("__btot"))
              .withColumn("__before_bucket",
                          F.coalesce(F.sum("__btot").over(wb), F.lit(0)))
              .select("__b", "__before_bucket"))
    ww = (W.partitionBy("__b").orderBy(F.desc("__s"), F.col(id_col))
          .rowsBetween(W.unboundedPreceding, -1))
    return (bucketed.join(F.broadcast(prefix), "__b")
            .withColumn("__before",
                        F.col("__before_bucket") +
                        F.coalesce(F.sum("n_tok").over(ww), F.lit(0)))
            .filter(F.col("__before") < budget_tokens)
            .select(id_col, "n_tok"))


def preference_pairs(df: DataFrame, group_cols: list[str], score: Column,
                     id_col: str = "doc_id") -> DataFrame:
    """RLHF/DPO preference-pair assembly: per group, pair the
    highest-scoring member (chosen) with the lowest-scoring one (rejected)
    and report the margin. Deterministic argmax/argmin via lexicographic
    struct max/min (ties broken by id: highest id wins chosen, lowest id
    wins rejected), so any SQL engine reproduces the pairing. Groups
    without a strict preference (margin 0, incl. singletons) are dropped.

    One grouped aggregate — no window, no self-join; scales to any group
    count and any skew (per-group state is two structs)."""
    best = F.max(F.struct(score.alias("s"), F.col(id_col).alias("i")))
    worst = F.min(F.struct(score.alias("s"), F.col(id_col).alias("i")))
    return (df.groupBy(*group_cols)
            .agg(best.alias("__b"), worst.alias("__w"))
            .select(*group_cols,
                    F.col("__b.i").alias("chosen_id"),
                    F.col("__w.i").alias("rejected_id"),
                    (F.col("__b.s") - F.col("__w.s")).alias("margin"))
            .filter(F.col("margin") > 0))


def quota_allocation(df: DataFrame, group_col: str,
                     budget: int) -> DataFrame:
    """Exact proportional allocation of an integer ``budget`` across
    groups by the largest-remainder (Hamilton) method: each group gets
    ``floor(budget·n_g / total)``, and the leftover seats go to the
    largest fractional remainders (ties broken by group value) — so
    allocations sum to EXACTLY ``budget``, something independent
    per-group rounding cannot promise. The training-mixture budgeting
    primitive behind "sample 10M sequences proportionally by source".

    All arithmetic is integer (``budget·n_g`` stays in long range for
    budgets×counts < 2^63) — no float quotas, no engine drift; the
    group-count frame is tiny, so the ranking windows cost nothing.
    Output: ``(group_col, n_rows, allocated)``."""
    from pyspark.sql import Window as W

    counts = (df.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias("n_rows")))
    total = F.sum("n_rows").over(W.partitionBy())
    # `div` is true 64-bit integer division (no double detour — a
    # budget*count product past 2^53 would floor wrong under `/`)
    staged = (counts.withColumn("__t", total)
              .withColumn("__base",
                          F.expr(f"(CAST({int(budget)} AS BIGINT) "
                                 f"* n_rows) div __t"))
              .withColumn("__rem", F.pmod(F.lit(budget) * F.col("n_rows"),
                                          F.col("__t"))))
    leftover = (F.lit(budget)
                - F.sum("__base").over(W.partitionBy())).cast("long")
    rank = F.row_number().over(
        W.partitionBy().orderBy(F.col("__rem").desc(), F.col(group_col)))
    return (staged.withColumn("__l", leftover)
            .withColumn("__rk", rank)
            .select(group_col, "n_rows",
                    (F.col("__base")
                     + F.when(F.col("__rk") <= F.col("__l"), 1)
                     .otherwise(0)).alias("allocated")))


def es_weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                       k: int = 100, seed: str = "es0") -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact size ``k``
    (Efraimidis & Spirakis 2006): each row draws a deterministic
    md5-seeded uniform ``u`` and ranks by ``ln(u) / w`` descending —
    the top ``k`` keys are a weight-proportional sample, unlike
    per-row Bernoulli (:func:`weighted_sample`) whose output size is
    only expected. ``ln(u)/w`` is the log-space form of the paper's
    ``u^(1/w)`` key (same order, no pow). The uniform is the exact
    binary ``(h>>9 + 0.5) / 2^51`` construction shared with
    ``analytics.dp_noisy_counts``; rotate ``seed`` to resample.

    One map-side key computation + one top-k (TakeOrdered) — no
    shuffle beyond the final k rows. Rows with weight <= 0 are
    excluded (zero weight cannot be sampled; ES keys are undefined
    there). Output: ``(key_col, weight, es_key)``."""
    from otit_swt_spark.pipelines.dedup import seeded_uniform

    u = seeded_uniform(F.concat(F.lit(seed + ":"),
                                F.col(key_col).cast("string")))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (df.where(w > 0)
            .select(F.col(key_col), w.alias("weight"),
                    (F.round(key, 6) + F.lit(0.0)).alias("es_key"),
                    key.alias("__raw"))
            .orderBy(F.col("__raw").desc(), key_col)
            .limit(k)
            .drop("__raw"))
