"""Event-analytics operators: funnels, retention cohorts, histograms,
distinct-user rollups — the product-analytics workload a large event
store serves next to the time-series queries.

Scale shape: everything here is expressed as grouped aggregates and
key-equi joins on the user key, so consecutive stages reuse one hash
partitioning (user_id) and the only other shuffle is the final small
rollup. No windows over unbounded frames, no per-user arrays — a user
with 10M events costs the same as one with 10.

Reference: no twin in /root/reference (a query engine, not an analytics
suite); additive north-star surface like pipelines.packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_steps(events: DataFrame, steps: list[str],
                 key: str = "user_id", ts: str = "ts",
                 type_col: str = "event_type",
                 max_lag_seconds: float | None = None) -> DataFrame:
    """Ordered-funnel timestamps: for each user, the earliest time of
    step 1, then the earliest step-2 event strictly after it, and so on
    (the standard strict-order funnel). ``max_lag_seconds`` adds the
    conversion window: each step must also land within that many seconds
    of the previous one. Output: one row per user that completed step 1,
    with ``t1..tk`` timestamps (NULL once the funnel stalls).

    k-step funnel = k grouped mins + (k-1) inner joins and (k-1) left
    joins, all on the user key — one shuffle partitioning reused
    throughout.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    reached = (events.filter(F.col(type_col) == steps[0])
               .groupBy(key).agg(F.min(ts).alias("t1")))
    out = reached
    for i, step in enumerate(steps[1:], start=2):
        prev_t = f"t{i - 1}"
        within = F.col(ts) > F.col(prev_t)
        if max_lag_seconds is not None:
            # cast: unix_micros rejects TIMESTAMP_NTZ, which is what a raw
            # parquet read yields
            within &= (
                F.unix_micros(F.col(ts).cast("timestamp"))
                - F.unix_micros(F.col(prev_t).cast("timestamp"))
                <= F.lit(int(max_lag_seconds * 1_000_000)))
        nxt = (events.filter(F.col(type_col) == step)
               .join(reached.select(key, prev_t), key)
               .filter(within)
               .groupBy(key).agg(F.min(ts).alias(f"t{i}")))
        out = out.join(nxt.select(key, f"t{i}"), key, "left")
        reached = nxt
    return out


def retention_cohorts(events: DataFrame, key: str = "user_id",
                      ts: str = "ts") -> DataFrame:
    """Classic retention triangle: users grouped by first-seen day
    (cohort), counted on each later activity day as an offset. Output:
    ``(cohort_day, day_offset, n_users)``.

    Two shuffles: the first-seen min on the user key (reused by the
    activity join, same partitioning) and the final small rollup."""
    first_seen = (events.groupBy(key)
                  .agg(F.min(F.to_date(ts)).alias("cohort_day")))
    activity = events.select(key, F.to_date(ts).alias("activity_day")).distinct()
    return (activity.join(first_seen, key)
            .groupBy("cohort_day",
                     F.datediff("activity_day", "cohort_day").alias("day_offset"))
            .agg(F.countDistinct(key).alias("n_users")))


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              nbins: int) -> DataFrame:
    """Fixed-bound equi-width histogram: ``(bucket, lo_edge, n, vmin,
    vmax)``. Fixed bounds (not data-derived min/max) keep the bucketing
    a pure map-side expression — a single aggregate pass, deterministic
    across engines, and at scale a second pass over the data is the
    difference between one scan and two. Out-of-range rows clamp into
    the edge buckets."""
    if not (nbins >= 1 and hi > lo):
        raise ValueError("need nbins >= 1 and hi > lo")
    width = (hi - lo) / nbins
    v = F.col(col).cast("double")
    bucket = F.least(F.greatest(F.floor((v - lo) / width), F.lit(0)),
                     F.lit(nbins - 1))
    return (df.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min(v), 6).alias("vmin"),
                 F.round(F.max(v), 6).alias("vmax"))
            .withColumn("lo_edge", F.round(F.lit(lo) + F.col("bucket") * width, 6)))


def session_paths(events: DataFrame, key: str = "user_id", ts: str = "ts",
                  type_col: str = "event_type", gap_seconds: float = 1800,
                  order_cols: list[str] | None = None,
                  max_len: int | None = None) -> DataFrame:
    """Top navigation paths: sessionize, render each session's ordered
    event-type sequence as a ``a>b>c`` string, count distinct paths —
    the event-sequence mining readout. ``max_len`` truncates each
    session to its first N steps (the usual guard: one bot session with
    100k events otherwise builds a 100k-element array on one row).

    Shuffles: the sessionize window (key), one groupBy per (key,
    session), one small rollup on the path string.
    """
    from pyspark.sql import Window

    from otit_swt_spark.timeseries import sessionize

    order_cols = order_cols or []
    s = sessionize(events, key=key, ts=ts, gap_seconds=gap_seconds,
                   order_cols=order_cols)
    if max_len is not None:
        # truncate BEFORE collecting: the guard exists so one bot session
        # with 100k events never materializes a 100k-element array in an
        # aggregation buffer — a slice after collect_list would
        w = (Window.partitionBy(key, "session_idx")
             .orderBy(F.col(ts).asc(), *[F.col(c).asc() for c in order_cols]))
        s = (s.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= max_len).drop("__rn"))
    step = F.struct(F.col(ts), *[F.col(c) for c in order_cols],
                    F.col(type_col).alias("__t"))
    seq = F.transform(F.sort_array(F.collect_list(step)),
                      lambda x: x["__t"])
    paths = (s.groupBy(key, "session_idx")
             .agg(F.concat_ws(">", seq).alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions")))


def ab_test_stats(df: DataFrame, group_col: str, value_col: str,
                  group_a, group_b) -> DataFrame:
    """Two-sample experiment readout in ONE aggregation pass: per-variant
    n / mean / sample variance and the Welch t statistic with its
    effective degrees of freedom. Conditional aggregates (no pivot, no
    second scan); the sums are exact DECIMALs so the moments — and hence
    the t statistic — are independent of partitioning and summation
    order, which makes the readout reproducible in any engine.

    Output: one row ``(n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
    df_welch)``; the t fields are NULL when a variant has < 2 rows or
    zero variance on both sides.
    """
    dec = "decimal(38,6)"
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b

    def _sums(cond):
        n = F.sum(F.when(cond, 1).otherwise(0))
        s = F.sum(F.when(cond, v.cast(dec)).otherwise(F.lit(0).cast(dec)))
        # square in double (deterministic per row), then exact decimal sum
        sq = F.sum(F.when(cond, (v * v).cast(dec)).otherwise(F.lit(0).cast(dec)))
        return n, s, sq

    na, sa, qa = _sums(in_a)
    nb, sb, qb = _sums(in_b)
    agg = df.agg(
        na.alias("n_a"), sa.cast("double").alias("s_a"), qa.cast("double").alias("q_a"),
        nb.alias("n_b"), sb.cast("double").alias("s_b"), qb.cast("double").alias("q_b"))
    ma = F.col("s_a") / F.col("n_a")
    mb = F.col("s_b") / F.col("n_b")
    va = (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (F.col("n_a") - 1)
    vb = (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (F.col("n_b") - 1)
    se2 = va / F.col("n_a") + vb / F.col("n_b")
    t = F.try_divide(ma - mb, F.sqrt(se2))
    dfw = F.try_divide(
        se2 * se2,
        (va / F.col("n_a")) * (va / F.col("n_a")) / (F.col("n_a") - 1)
        + (vb / F.col("n_b")) * (vb / F.col("n_b")) / (F.col("n_b") - 1))
    return agg.select(
        F.col("n_a"), F.col("n_b"),
        F.round(ma, 6).alias("mean_a"), F.round(mb, 6).alias("mean_b"),
        F.round(va, 6).alias("var_a"), F.round(vb, 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"), F.round(dfw, 6).alias("df_welch"))


def distinct_daily(events: DataFrame, key: str = "user_id",
                   ts: str = "ts", type_col: str = "event_type",
                   approx: bool = False) -> DataFrame:
    """Daily active users per event type: ``(day, event_type, n_users,
    n_events)``. ``approx=True`` swaps the exact distinct (a full
    shuffle of (day, type, user) triples) for HyperLogLog
    ``approx_count_distinct`` — the 100 TB default, where a 2% error is
    free and the shuffle drops to one sketch per group."""
    day = F.to_date(ts).alias("day")
    n_users = (F.approx_count_distinct(key) if approx
               else F.countDistinct(key))
    return (events.groupBy(day, type_col)
            .agg(n_users.alias("n_users"),
                 F.count(F.lit(1)).alias("n_events")))


def zscore_anomalies(events: DataFrame, key: str = "user_id",
                     value: str = "value", threshold: float = 2.0,
                     id_col: str = "event_id") -> DataFrame:
    """Per-key z-score outliers: events whose value sits more than
    ``threshold`` sample standard deviations from the key's mean —
    the distribution-free anomaly screen run over every metric stream.

    One aggregation shuffle on the key builds (mean, stddev_samp) per
    key, joined back; constant series (stddev 0/NULL) produce no
    anomalies by definition. Scales: the stats frame is |keys| rows —
    no forced broadcast, because the key cardinality is unbounded (a
    billion users would blow the broadcast limit); AQE converts the join
    to broadcast at runtime whenever the stats frame is actually small."""
    stats = (events.groupBy(key)
             .agg(F.avg(value).alias("__mu"),
                  F.stddev_samp(value).alias("__sd")))
    z = (F.col(value) - F.col("__mu")) / F.col("__sd")
    return (events.join(stats, key)
            .filter(F.col("__sd").isNotNull() & (F.col("__sd") > 0)
                    & (F.abs(z) > threshold))
            .select(id_col, key,
                    F.col(value).alias("value"),
                    F.round(z, 6).alias("zscore")))


def cusum_changepoints(events: DataFrame, key: str = "event_type",
                       ts: str = "ts", value: str = "value",
                       id_col: str = "event_id", slack: float = 0.5,
                       threshold: float = 5.0) -> DataFrame:
    """One-sided (upward) CUSUM drift detection per key: the classic
    change-point monitor S_i = max(0, S_{i-1} + z_i - slack) with an
    alarm when S crosses ``threshold`` — run over every metric stream to
    catch sustained mean shifts that per-point z-scores miss.

    The recurrence looks sequential, but max(0, ...) folds into pure
    windows via the running-minimum identity
    ``S_i = C_i - min(0, min_{j<=i} C_j)`` where C is the plain
    cumulative sum of (z - slack): one key-partitioned window shuffle,
    no applyInPandas, no recursion — the same identity a SQL oracle
    replays verbatim. Per-key mean/stddev come from exact DECIMAL
    moments (partitioning-independent), so z is bit-reproducible.
    Output: (id_col, key, ts, cusum rounded 6 dp, alarm); constant
    series (sd = 0) yield NULL cusum and alarm false."""
    from pyspark.sql import Window as W

    dec = "decimal(38,12)"
    x = F.col(value).cast("double")
    stats = (events.groupBy(key)
             .agg(F.count(F.lit(1)).alias("__n"),
                  F.sum(x.cast(dec)).alias("__s"),
                  F.sum((x * x).cast(dec)).alias("__q")))
    s, q, n = (F.col("__s").cast("double"), F.col("__q").cast("double"),
               F.col("__n"))
    sd = F.sqrt((q - s * s / n) / (n - 1))
    y = F.try_divide(x - s / n, sd) - F.lit(slack)
    w = (W.partitionBy(key).orderBy(ts, id_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    staged = (events.join(stats, key)
              .withColumn("__c", F.sum(y).over(w)))
    cusum = F.round(
        F.col("__c") - F.least(F.lit(0.0), F.min("__c").over(w)), 6)
    return (staged
            .select(id_col, key, ts, cusum.alias("cusum"))
            .withColumn("alarm",
                        F.coalesce(F.col("cusum") > threshold,
                                   F.lit(False))))


def attribute_last_touch(events: DataFrame, convert_type: str = "purchase",
                         touch_type: str = "click",
                         window_seconds: float = 7 * 86400.0,
                         key: str = "user_id", ts: str = "ts",
                         id_col: str = "event_id") -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent preceding touch event by the same user within the lookback
    window (left outer — unattributed conversions keep NULLs). Built on
    the as-of join (one union + one key shuffle + running window — no
    range join), so it inherits that operator's linear plan shape."""
    from otit_swt_spark.timeseries import asof_join

    conv = (events.filter(F.col("event_type") == convert_type)
            .select(F.col(id_col).alias("conversion_id"), key, ts))
    touch = (events.filter(F.col("event_type") == touch_type)
             .select(key, ts, F.col(id_col).alias("touch_id")))
    out = asof_join(conv, touch, on=key, left_ts=ts, right_ts=ts,
                    value_columns=["touch_id"],
                    tolerance_seconds=window_seconds)
    gap = (F.unix_micros(F.col(ts).cast("timestamp")) -
           F.unix_micros(F.col(f"{ts}_matched").cast("timestamp")))
    return out.select(
        "conversion_id", key,
        F.col("touch_id_matched").alias("touch_id"),
        F.when(F.col("touch_id_matched").isNotNull(), gap).alias("gap_us"))


def winsorize(df: DataFrame, value_col: str, group_col: str,
              lower: float = 0.01, upper: float = 0.99) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into the group's
    [p_lower, p_upper] interpolated-percentile band — the standard outlier
    treatment before training-statistics aggregation.

    One grouped percentile aggregate (tiny: one row per group) broadcast
    back, then a map-side clamp — no per-row shuffle. Bounds are rounded
    to 6 dp BEFORE clamping so the clamp decision is reproducible across
    engines (percentile interpolation may differ in the last ulp).
    Output: the input columns plus ``lo``/``hi``/``value_w``."""
    bounds = (df.groupBy(group_col)
              .agg(F.round(F.expr(f"percentile({value_col}, {lower})"), 6)
                   .alias("lo"),
                   F.round(F.expr(f"percentile({value_col}, {upper})"), 6)
                   .alias("hi")))
    return (df.join(F.broadcast(bounds), group_col)
            .withColumn("value_w",
                        F.least(F.greatest(F.col(value_col), F.col("lo")),
                                F.col("hi"))))


def histogram_equidepth(df: DataFrame, col: str,
                        n_buckets: int = 8) -> DataFrame:
    """Equi-DEPTH histogram (quantile-bounded buckets of ~equal row
    count — the distribution summary optimizers and drift monitors use,
    complementing :func:`histogram`'s fixed-width buckets): bucket i
    holds values in (q_{i/n}, q_{(i+1)/n}]. One percentile aggregate
    builds the n-1 internal bounds (rounded to 6 dp so any engine
    reproduces the cuts), broadcast back as a one-row frame; assignment
    is a map-side filter-count over that tiny array. NULL values are
    excluded (percentile ignores them, so counting them — they'd land in
    bucket 0, every NULL comparison dropping all bounds — would inflate
    the lowest bucket with rows the bounds never saw)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    df = df.filter(F.col(col).isNotNull())
    bounds = df.agg(F.transform(
        F.expr(f"percentile({col}, array({', '.join(map(str, qs))}))"),
        lambda b: F.round(b, 6)).alias("__bounds"))
    bucket = F.size(F.filter(F.col("__bounds"),
                             lambda b: F.col(col) > b))
    return (df.crossJoin(F.broadcast(bounds))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows")))


def population_stability(df_a: DataFrame, df_b: DataFrame, col: str,
                         lo: float, hi: float, nbins: int = 10,
                         eps: float = 1e-6) -> DataFrame:
    """Population stability index between two snapshots of a metric
    distribution — the standard drift monitor run between training
    corpus versions (PSI < 0.1 stable, > 0.25 shifted). Fixed-bound
    equi-width buckets (data-independent, so the bucketing is one
    map-side expression on each snapshot and reproducible anywhere);
    shares are smoothed with ``eps`` so empty buckets contribute a
    finite penalty instead of an infinite log.

    Output: one row per bucket with both shares and the PSI term
    (``(pa - pb) * ln(pa / pb)``, rounded to 6 dp — sum the column for
    the headline index). Scale: two aggregate passes + joins on a
    <= nbins-row frame."""
    from pyspark.sql import Window as W

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (histogram(df, col, lo, hi, nbins)
                .select("bucket", F.col("n").alias(out)))

    joined = (counts(df_a, "n_a")
              .join(counts(df_b, "n_b"), "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("n_a", F.lit(0)).alias("n_a"),
                      F.coalesce("n_b", F.lit(0)).alias("n_b")))
    w = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    pa = F.greatest(F.col("n_a") / F.sum("n_a").over(w), F.lit(float(eps)))
    pb = F.greatest(F.col("n_b") / F.sum("n_b").over(w), F.lit(float(eps)))
    return (joined
            .select("bucket", "n_a", "n_b",
                    F.round(pa, 6).alias("share_a"),
                    F.round(pb, 6).alias("share_b"),
                    F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"))
            )


def count_min_sketch(df: DataFrame, key_col: str, width: int = 256,
                     depth: int = 4) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key column:
    ``depth × width`` counters, cell ``(r, c)`` summing the rows whose
    md5-salted hash for row ``r`` lands in column ``c``. The fixed-size
    mergeable summary for frequency estimation over keys too numerous to
    group exactly — per-partition sketches merge by cell addition, so the
    shuffle is ``depth·width`` cells per partition regardless of key
    cardinality (vs a full groupBy shuffling every distinct key).

    Deterministic md5 row-salted hashing (the repo's oracle-replayable
    primitive), so two sketches built anywhere agree cell-for-cell.
    Returns ``(row, col, cnt)`` — only occupied cells; absent cells are
    zero."""
    rows_ = F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"cms{r}:"),
                               F.col(key_col).cast("string"))), 1, 8),
                16, 10).cast("long") % width).alias("col"))
        for r in range(depth)])
    return (df.select(F.explode(rows_).alias("rc"))
            .groupBy(F.col("rc.row").alias("row"),
                     F.col("rc.col").alias("col"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 width: int = 256, depth: int = 4) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each key,
    ``est = min over rows of cell(r, h_r(key))`` — an upper bound on the
    true count with overestimate bounded by ``e·N/width`` at probability
    ``1 − e^{−depth}``. The sketch is broadcast (``depth·width`` cells),
    so estimating any number of keys is map-side + one small join."""
    probes = keys.select(F.col(key_col), F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"cms{r}:"),
                               F.col(key_col).cast("string"))), 1, 8),
                16, 10).cast("long") % width).alias("col"))
        for r in range(depth)])).alias("rc")) \
        .select(key_col, F.col("rc.row").alias("row"),
                F.col("rc.col").alias("col"))
    return (probes.join(F.broadcast(sketch), ["row", "col"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 4096,
                k: int = 5) -> DataFrame:
    """Bloom filter as a set-bit frame ``(pos)``: each key sets ``k``
    md5-salted positions in ``[0, n_bits)``. The mergeable seen-set for
    100 TB membership (URL dedup frontiers, processed-id ledgers): union
    two filters by unioning their bit frames; the frame is at most
    ``n_bits`` rows no matter how many keys went in, and probing
    broadcasts it. Deterministic md5 hashing — replayable anywhere."""
    positions = F.array(*[
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"bl{i}:"), F.col(key_col).cast("string"))),
            1, 8), 16, 10).cast("long") % n_bits)
        for i in range(k)])
    return (df.select(F.explode(positions).alias("pos")).distinct())


def bloom_probe(bloom: DataFrame, keys: DataFrame, key_col: str,
                n_bits: int = 4096, k: int = 5) -> DataFrame:
    """Membership probe: a key is (maybe) present iff ALL its ``k``
    positions are set — no false negatives, false-positive rate
    ``(1 - e^{-kn/m})^k``. The bit frame broadcasts; probing any number
    of keys is map-side + one small join."""
    probes = keys.select(F.col(key_col), F.explode(F.array(*[
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"bl{i}:"), F.col(key_col).cast("string"))),
            1, 8), 16, 10).cast("long") % n_bits)
        for i in range(k)])).alias("pos"))
    # no forced broadcast: a 2^12-bit filter broadcasts on its own under
    # the threshold, while a 2^26-bit frame (tens of millions of set
    # bits) must go through a shuffle join — the forced hint OOMed the
    # driver at exactly that scale (caught by the 10M-key smoke)
    hit = (probes.join(bloom.withColumn("__set", F.lit(1)),
                       "pos", "left")
           .groupBy(key_col)
           .agg((F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0))))
                .alias("maybe_present")))
    return hit


def bloom_word_map(bloom: DataFrame, n_bits: int = 4096) -> DataFrame:
    """Pack a Bloom bit frame ``(pos)`` into ONE row carrying a map
    ``word -> 63-bit word of set bits`` (``word = pos DIV 63``,
    ``bit = pos % 63``). Words are deliberately 63 bits wide so the
    packing never touches the sign bit — ``shiftleft(1, bit)`` with
    ``bit <= 62`` is exact, replayable signed-long arithmetic in Spark
    AND DuckDB (``1::BIGINT << 63`` would overflow or go negative
    depending on the engine).

    This is the broadcastable constant-size ledger form a STATELESS
    membership probe needs: :func:`bloom_probe` resolves membership
    with a per-key aggregate, which a streaming frontier cannot run in
    append mode, but any number of rows can cross-join this one
    broadcast row and test their ``k`` bits map-side
    (:func:`bloom_unseen_flags`). ``ceil(n_bits/63)`` map entries —
    ~66 for the default 4096-bit filter, ~1M for a 2^26-bit crawl
    ledger (8 MB broadcast, well under executor budgets)."""
    words = (bloom.select(
        F.expr("CAST(pos DIV 63 AS BIGINT)").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
        .alias("m"))
        .groupBy("w").agg(F.expr("bit_or(m)").alias("bits")))
    return words.agg(F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("w", "bits"))))
        .alias("bloom_words"))


def bloom_unseen_flags(keys: DataFrame, bloom_words: DataFrame,
                       key_col: str, n_bits: int = 4096,
                       k: int = 5) -> DataFrame:
    """Per-row Bloom membership WITHOUT aggregation: cross-join the
    one-row broadcast word map (:func:`bloom_word_map`) and test all
    ``k`` md5-salted positions per row — ``maybe_present`` iff every
    position's bit is set. Identical decision to :func:`bloom_probe`
    (same salts, same positions, no false negatives), but stateless and
    append-mode legal, so it runs unchanged on a STREAM — the form
    ``streaming.crawl.stream_frontier_unseen`` builds on. The one-row
    attach goes through a dummy-key BROADCAST EQUI-join (not a cross
    join) because stream-static cross joins are rejected by the
    streaming planner; bound = 1 row x probe rows either way."""
    for rider in ("bloom_words", "__j", "maybe_present"):
        if rider in keys.columns:
            # fail fast instead of silently overwriting/colliding with a
            # caller column (the r10 rider-collision discipline)
            raise ValueError(
                f"bloom_unseen_flags: probe frame already has a "
                f"{rider!r} column")
    if "`" in key_col:
        raise ValueError("key_col must not contain backticks")
    tests = []
    for i in range(k):
        # backtick-quoted: key_col reaches a SQL expr string here (the
        # other bloom fns go through F.col and are immune to specials)
        p = (f"(CAST(conv(substring(md5(concat('bl{i}:', "
             f"CAST(`{key_col}` AS STRING))), 1, 8), 16, 10) AS BIGINT) "
             f"% {n_bits})")
        tests.append(
            f"(coalesce(element_at(bloom_words, CAST({p} DIV 63 AS "
            f"BIGINT)), CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS "
            f"BIGINT), CAST({p} % 63 AS INT))) != 0")
    one = F.broadcast(bloom_words.withColumn("__j", F.lit(1)))
    return (keys.withColumn("__j", F.lit(1)).join(one, "__j")
            .withColumn("maybe_present", F.expr(" AND ".join(tests)))
            .drop("bloom_words", "__j"))


def hll_sketch(df: DataFrame, key_col: str, b: int = 10) -> DataFrame:
    """Deterministic HyperLogLog register frame ``(bucket, max_rho)``
    (Flajolet et al. 2007): 60-bit md5 hash, top ``b`` bits pick the
    bucket, rho = leading-zeros-plus-one of the remaining ``50`` bits
    (via ``length(bin(rest))`` — exact integer math, no floats). Unlike
    ``approx_count_distinct`` this sketch is bit-replayable in any SQL
    engine AND mergeable by ``max`` per bucket — shuffle-bounded distinct
    counting at 2^b rows of state."""
    if b != 10:
        raise ValueError("b=10 is the calibrated/oracle-replayed width")
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("long")
    bucket = F.shiftright(h, 50)
    rest = h.bitwiseAND(F.lit((1 << 50) - 1))
    rho = F.when(rest > 0, F.lit(51) - F.length(F.bin(rest))) \
        .otherwise(F.lit(51))
    return (df.select(bucket.cast("int").alias("bucket"), rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("max_rho")))


def hll_estimate(sketch: DataFrame, b: int = 10) -> DataFrame:
    """Cardinality estimate from the register frame: the harmonic-mean
    estimator with the small-range linear-counting correction. The
    2^-rho sum runs SCALED IN INTEGERS (sum of 2^(51-rho) longs — exact,
    order-insensitive) with ONE double division at the end, so the
    rounded estimate is bit-identical across engines and partition
    orders. Returns one row ``(n_buckets_used, estimate)``."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # 2^(51-rho) via double pow then cast: exponents <= 51 are exactly
    # representable (< 2^53), and shiftleft needs a literal shift amount
    agg = sketch.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.pow(F.lit(2.0), F.lit(51) - F.col("max_rho"))
              .cast("long")).alias("s"))
    total = (F.col("s")
             + (F.lit(m) - F.col("used")) * F.lit(1 << 51).cast("long"))
    e_raw = F.lit(alpha * m * m * float(1 << 51)) / total.cast("double")
    v = (F.lit(m) - F.col("used")).cast("double")
    est = F.when((e_raw <= 2.5 * m) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)
                 ).otherwise(e_raw)
    return agg.select(F.col("used").alias("n_buckets_used"),
                      F.round(est, 6).alias("estimate"))


def theta_sketch(df: DataFrame, key_col: str, group_col: str,
                 k: int = 64, salt: int = 32) -> DataFrame:
    """KMV / theta sketch per group (Bar-Yossef et al. 2002; the
    Datasketches theta family): keep the ``k`` SMALLEST 60-bit md5
    hashes of the distinct keys in each group. Distinct-count estimate
    ``(k-1) * 2^60 / theta`` where ``theta`` is the k-th smallest hash;
    groups with fewer than ``k`` distinct keys are counted exactly
    (``theta`` pegged at ``2^60``).

    Unlike HLL (:func:`hll_sketch`), a theta sketch supports SET
    OPERATIONS — intersections and Jaccard between groups
    (:func:`theta_overlap`) — because it keeps a uniform hash SAMPLE,
    not just register maxima. Reference parity: the reference exposes
    only exact COUNT(DISTINCT) (hybrid GroupBy lowering); this is the
    100 TB-scale companion (audience overlap without pairwise exact
    distinct joins).

    Scale shape: one shuffle for the (group, key) distinct, then a
    SALTED two-phase top-k — per-(group, salt-cell) window keeps ``k``
    rows, then the per-group merge window sees at most ``salt * k`` rows
    per group, so a hot group (every user clicks) never funnels its full
    distinct set through one task. Top-k is a semilattice, so the
    two-phase merge is exactly the global top-k (what a cluster-wide
    sketch union computes). Deterministic md5 — replayable in any SQL
    engine. Output: ``(group_col, ks array<long>, n_kept, theta, est)``.
    """
    from pyspark.sql import Window as W

    from otit_swt_spark.pipelines.dedup import _md5_60

    d = (df.select(F.col(group_col), F.col(key_col).cast("string")
                   .alias("__k")).distinct()
         .select(group_col, _md5_60(F.col("__k")).alias("__h"),
                 F.pmod(F.xxhash64("__k"), F.lit(salt)).alias("__s")))
    w1 = W.partitionBy(group_col, "__s").orderBy("__h")
    w2 = W.partitionBy(group_col).orderBy("__h")
    kept = (d.withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .withColumn("__r2", F.row_number().over(w2))
            .where(F.col("__r2") <= k))
    return theta_finalize(kept, group_col, k=k)


def theta_overlap(df: DataFrame, key_col: str, group_col: str,
                  k: int = 64, salt: int = 32) -> DataFrame:
    """Pairwise audience overlap between groups from theta sketches:
    for each group pair the intersection/union distinct-count estimates
    and the Jaccard similarity of the two key SETS — without ever
    joining the raw key sets pairwise (the sketch frame is ``n_groups``
    rows; the pair join is a broadcast self-join over it).

    Estimator (standard theta set ops): clip both sketches to
    ``theta_min = min(theta_a, theta_b)``; among the clipped hash
    union, the fraction also present in both sketches estimates Jaccard
    exactly as a uniform-sample ratio, and ``count * 2^60 / theta_min``
    scales the clipped counts back to cardinalities. All arithmetic is
    exact-integer until one final double division — bit-replayable.

    Output: ``(group_a, group_b, est_a, est_b, est_intersection,
    est_union, jaccard)``, one row per unordered pair, group_a <
    group_b."""
    theta_one_f = float(1 << 60)
    sk = theta_sketch(df, key_col, group_col, k=k, salt=salt)
    a = sk.select(F.col(group_col).alias("group_a"),
                  F.col("ks").alias("ks_a"), F.col("theta").alias("th_a"),
                  F.col("est").alias("est_a"))
    b = sk.select(F.col(group_col).alias("group_b"),
                  F.col("ks").alias("ks_b"), F.col("theta").alias("th_b"),
                  F.col("est").alias("est_b"))
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    th = F.least("th_a", "th_b")
    below = lambda c: F.filter(c, lambda x: x < F.col("__th"))
    inter = F.size(below(F.array_intersect("ks_a", "ks_b")))
    union = F.size(below(F.array_union("ks_a", "ks_b")))
    return (pairs.withColumn("__th", th)
            .withColumn("__ni", inter).withColumn("__nu", union)
            .select("group_a", "group_b", "est_a", "est_b",
                    F.round(F.col("__ni") * F.lit(theta_one_f)
                            / F.col("__th").cast("double"), 6)
                    .alias("est_intersection"),
                    F.round(F.col("__nu") * F.lit(theta_one_f)
                            / F.col("__th").cast("double"), 6)
                    .alias("est_union"),
                    F.when(F.col("__nu") > 0,
                           F.round(F.col("__ni").cast("double")
                                   / F.col("__nu").cast("double"), 6))
                    .otherwise(F.lit(0.0)).alias("jaccard")))


def assoc_rules(df: DataFrame, basket_col: str, item_col: str,
                min_pair: int = 2, top: int = 50,
                max_basket_size: int | None = None) -> DataFrame:
    """Association-rule mining (Agrawal & Srikant 1994's support/
    confidence frame plus lift) over (basket, item) rows: for every
    ordered item pair co-occurring in >= ``min_pair`` baskets, emit
    ``support = n_ab / N``, ``confidence = n_ab / n_a`` and
    ``lift = (n_ab / n_a) * (N / n_b)``, keeping the ``top`` rules by
    (lift, confidence, antecedent, consequent) — a deterministic
    total order, replayable in any SQL engine.

    Scale shape: the pair generator is a SELF-JOIN ON THE BASKET KEY,
    so the blow-up is quadratic only in basket size (bounded by order
    width, not corpus size) and the shuffle is linear in total items;
    item marginals broadcast, and the basket total is the one-row
    scalar cross this repo whitelists. No all-pairs item join ever
    happens — the co-occurrence graph materializes only where baskets
    witness it."""
    items = (df.select(F.col(basket_col).alias("__b"),
                       F.col(item_col).alias("__i")).distinct())
    if max_basket_size is not None:
        # one mega-basket (the bot order, the crawler session) otherwise
        # emits |basket|^2 pairs and owns the stage — drop it BEFORE
        # pairing, the same clip cooccurrence_edges applies
        ok = (items.groupBy("__b")
              .agg(F.count(F.lit(1)).alias("__sz"))
              .filter(F.col("__sz") <= max_basket_size).select("__b"))
        items = items.join(ok, "__b")
    total = items.agg(F.countDistinct("__b").alias("__n"))
    marg = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__m"))
    a = items.select(F.col("__b"), F.col("__i").alias("antecedent"))
    b = items.select(F.col("__b"), F.col("__i").alias("consequent"))
    pairs = (a.join(b, "__b")
             .where(F.col("antecedent") != F.col("consequent"))
             .groupBy("antecedent", "consequent")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_pair))
    rules = (pairs
             .join(F.broadcast(marg.select(F.col("__i").alias("antecedent"),
                                           F.col("__m").alias("__na"))),
                   "antecedent")
             .join(F.broadcast(marg.select(F.col("__i").alias("consequent"),
                                           F.col("__m").alias("__nb"))),
                   "consequent")
             .crossJoin(F.broadcast(total)))
    return (rules.select(
        "antecedent", "consequent", "n_ab",
        F.round(F.col("n_ab") / F.col("__n").cast("double"), 6)
        .alias("support"),
        F.round(F.col("n_ab") / F.col("__na").cast("double"), 6)
        .alias("confidence"),
        F.round((F.col("n_ab") / F.col("__na").cast("double"))
                * (F.col("__n") / F.col("__nb").cast("double")), 6)
        .alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("confidence").desc(),
                 "antecedent", "consequent")
        .limit(top))


def markov_transitions(events: DataFrame, key: str = "user_id",
                       ts: str = "ts", state_col: str = "event_type",
                       order_cols: list[str] | None = None,
                       laplace: float = 1.0) -> DataFrame:
    """First-order Markov transition model of per-key event sequences:
    ``(from_state, to_state, n, p)`` where ``p`` is the
    Laplace-smoothed transition probability
    ``(n + λ) / (n_from + λ·|states|)`` — the user-behavior /
    next-event model behind session simulation and anomaly scoring
    (a low-probability observed transition is a surprise signal).

    One key-partitioned window pass pairs each event with its
    successor (no self-join); counts aggregate once. The state
    vocabulary size enters as a one-row broadcast scalar. Smoothed
    probabilities are exact integer-ratio doubles, SQL-replayable."""
    from pyspark.sql import Window as W

    order = [ts, *(order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    # NULL is not a state: excluded from sequences AND the vocabulary
    # (the SQL oracle's count(DISTINCT ...) drops NULL; counting it
    # here would skew the Laplace denominator)
    nn = events.where(F.col(state_col).isNotNull())
    pairs = (nn.select(F.col(key), *[F.col(c) for c in order],
                       F.col(state_col).alias("from_state"))
             .withColumn("to_state", F.lead("from_state").over(w))
             .where(F.col("to_state").isNotNull())
             .groupBy("from_state", "to_state")
             .agg(F.count(F.lit(1)).alias("n")))
    n_states = (nn.select(F.col(state_col)).distinct()
                .agg(F.count(F.lit(1)).alias("__v")))
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__t"))
    return (pairs.join(F.broadcast(totals), "from_state")
            .crossJoin(F.broadcast(n_states))
            .select("from_state", "to_state", "n",
                    F.round((F.col("n") + F.lit(laplace))
                            / (F.col("__t")
                               + F.lit(laplace) * F.col("__v")), 6)
                    .alias("p")))


def theta_finalize(kept: DataFrame, group_col: str,
                   k: int = 64) -> DataFrame:
    """Finalize a ``(group, __h)`` minimum-hash frame (as stored by the
    streaming theta sink) into the sketch row shape of
    :func:`theta_sketch`: ``(group_col, ks, n_kept, theta, est)``."""
    theta_one = 1 << 60
    sk = (kept.groupBy(group_col)
          .agg(F.sort_array(F.collect_list("__h")).alias("ks"),
               F.count(F.lit(1)).alias("n_kept")))
    theta = F.when(F.col("n_kept") >= k,
                   F.element_at("ks", k)).otherwise(F.lit(theta_one))
    est = F.when(F.col("n_kept") >= k,
                 F.round(F.lit(float(k - 1) * float(theta_one))
                         / F.col("theta").cast("double"), 6)) \
        .otherwise(F.col("n_kept").cast("double"))
    return (sk.withColumn("theta", theta).withColumn("est", est))


def quantile_sketch(df: DataFrame, value_col: str, id_col: str,
                    group_col: str, k: int = 256, seed: str = "qs0",
                    salt: int = 32) -> DataFrame:
    """Mergeable bottom-k quantile sketch per group: keep the ``k`` rows
    with the SMALLEST 60-bit md5 hash of ``seed:id`` — a deterministic
    uniform without-replacement sample of the group's rows (hash ranking
    is the distributed reservoir), from which any quantile is estimated
    as an exact order statistic of the sample. The quantile member of
    the sketch family (HLL = distinct, CMS = counts, theta = set ops):
    the streaming-p99 / monitoring primitive that answers "what is this
    window's p95 doc length" at 100 TB without an exact per-window sort.

    Design note vs KLL/t-digest (Karnin-Lang-Liberty 2016; Dunning's
    t-digest): those compactor sketches give tighter space/error
    tradeoffs but their state depends on arrival/merge ORDER (random or
    sequence-dependent compaction), so no SQL engine can replay them
    bit-for-bit. The bottom-k sample is a pure function of the input
    SET: same house invariants as :func:`theta_sketch` (deterministic
    md5, order-independent, SQL-replayable) and its merge is EXACT —
    bottom-k of a union is the bottom-k of the two bottom-k's (top-k
    semilattice), so cluster-wide unions lose nothing. Rank error is
    the sampling envelope O(sqrt(p(1-p)/k)) whp, pytest-gated against
    exact quantiles.

    Scale shape: one SALTED two-phase top-k exactly like
    :func:`theta_sketch` — per-(group, salt-cell) window keeps ``k``
    rows, the per-group merge window sees at most ``salt * k`` rows, so
    a hot group never funnels its raw rows through one task. NULL
    values are excluded (a NULL has no rank position), and so are NULL
    ids — a row without identity hashes to NULL, which Spark's
    ascending sort puts FIRST and most SQL engines put LAST, so it
    would silently displace real samples on one side only. Output:
    ``(group_col, __h, v)`` — one row per kept sample."""
    from pyspark.sql import Window as W

    from otit_swt_spark.pipelines.dedup import _md5_60

    d = (df.where(F.col(value_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .select(F.col(group_col),
                 F.col(value_col).cast("double").alias("v"),
                 _md5_60(F.concat(F.lit(seed + ":"),
                                  F.col(id_col).cast("string")))
                 .alias("__h"),
                 F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                        F.lit(salt)).alias("__s")))
    # DENSE rank on __h, not row_number: the sketch's k is a count of
    # DISTINCT hashes, so duplicate (group, __h) rows (the same id
    # re-delivered, possibly with a changed value, or a 60-bit
    # collision) must not each consume a top-k slot — a row_number cut
    # collapsed AFTER the cut could hold < k distinct hashes and
    # disagree with quantile_sketch_merge, which collapses FIRST and
    # then cuts. dense_rank keeps every row of the first k distinct
    # hashes; the min(v) collapse then applies the same deterministic
    # tie-break the merge uses, so batch == merged-stream bit-for-bit
    # even under redelivery. Per-window state stays bounded by k
    # distinct hashes (x duplicate multiplicity, input-bounded).
    w1 = W.partitionBy(group_col, "__s").orderBy("__h")
    w2 = W.partitionBy(group_col).orderBy("__h")
    return (d.withColumn("__r1", F.dense_rank().over(w1))
            .where(F.col("__r1") <= k)
            .withColumn("__r2", F.dense_rank().over(w2))
            .where(F.col("__r2") <= k)
            .groupBy(group_col, "__h").agg(F.min("v").alias("v")))


def quantile_sketch_merge(a: DataFrame, b: DataFrame,
                          group_col: str | list[str],
                          k: int = 256) -> DataFrame:
    """Merge two bottom-k quantile sketches: union and re-take the k
    smallest hashes per group (on at most 2k rows per group). Duplicate
    (group, hash) rows — the same underlying row seen by both sides —
    collapse first, so merge is idempotent as well as associative and
    commutative: EXACTLY the sketch of the union of the two row sets.
    ``group_col`` may be a composite key (the windowed streaming sink
    merges on (group, window_start)); the streaming sinks delegate
    here so batch and stream share ONE merge implementation."""
    from pyspark.sql import Window as W

    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    # min(v) per (group, __h), NOT dropDuplicates on (group, __h): if
    # the same id is re-delivered with a changed value (or two ids
    # collide in the 60-bit hash) dropDuplicates would pick the
    # surviving v nondeterministically — min(v) is the deterministic
    # tie-break, mirrored in the batch sketch's post-top-k collapse
    u = (a.select(*gcols, "__h", "v")
         .unionByName(b.select(*gcols, "__h", "v"))
         .groupBy(*gcols, "__h").agg(F.min("v").alias("v")))
    w = W.partitionBy(*gcols).orderBy("__h")
    return (u.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= k).drop("__r"))


def quantile_estimate(sketch: DataFrame, group_col: str,
                      probs: tuple = (0.25, 0.5, 0.75, 0.95)) -> DataFrame:
    """Quantile estimates from a bottom-k sketch frame: per group, sort
    the (<= k) sampled values and read each probability's NEAREST-LOWER
    order statistic — ``q_p = arr[floor(p * (n-1)) + 1]`` (1-based), the
    deterministic interpolation both engines replay exactly (no float
    averaging of adjacent order statistics). The per-group state is the
    sketch's k rows, so the collect_list is bounded by construction.
    Output long format: ``(group_col, p, q, n_kept)``."""
    agg = (sketch.groupBy(group_col)
           .agg(F.array_sort(F.collect_list("v")).alias("__arr"),
                F.count(F.lit(1)).alias("n_kept")))
    p = F.explode(F.array(*[F.lit(float(x)) for x in probs])).alias("p")
    idx = (F.floor(F.col("p") * (F.col("n_kept") - 1).cast("double"))
           .cast("int") + 1)
    return (agg.select(group_col, "n_kept", "__arr", p)
            .select(group_col, "p",
                    F.element_at("__arr", idx).alias("q"), "n_kept"))


def exact_kth_int(df: DataFrame, col: str, k: int,
                  buckets: int = 1024, tail: int = 4096,
                  bounds: tuple[int, int, int] | None = None) -> int:
    """EXACT k-th smallest value (1-indexed) of an integer column,
    computed distributed: iterative range-pruned counting — each round
    one map-side histogram over at most ``buckets`` groups narrows the
    candidate range by ~1000x, so a 64-bit domain resolves in <= 7
    aggregate passes with driver state bounded at ``buckets`` rows.
    This is exact distributed selection (exact median, exact quantile
    cutoffs) without a global sort — the thing ``percentile_approx``
    refuses to promise and ``ORDER BY LIMIT k`` cannot do at scale
    (take-ordered collects k rows to the driver).

    The oracle side needs no algorithm replay: the k-th order statistic
    is a VALUE — any engine's sort produces the same one.

    Domain constraint: ``max - min`` must fit in int64 (the shifted
    ``value - lo`` term is computed in BIGINT under ANSI mode); the
    full 2^64 span of simultaneous near-min and near-max longs would
    overflow the shift. Timestamps, counts and ids are fine."""
    if k < 1:
        raise ValueError("k is 1-indexed and must be >= 1")
    c = F.col(col)
    if bounds is None:
        row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi"),
                     F.count(c).alias("n")).first()
        bounds = (row["lo"], row["hi"], row["n"])
    lo, hi, n = bounds
    if lo is None or k > n:
        raise ValueError(f"k={k} out of range (n={n})")
    while hi - lo > tail:
        w = (hi - lo) // buckets + 1
        # 64-bit `div`, not `/`: a float quotient misassigns buckets
        # once (value - lo) exceeds 2^53 (full-range long domains)
        hist = (df.where(c.between(lo, hi))
                .groupBy(F.expr(f"(CAST({col} AS BIGINT) "
                                f"- CAST({int(lo)} AS BIGINT)) "
                                f"div CAST({int(w)} AS BIGINT)")
                         .alias("b"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect())
        cum = 0
        for r in sorted(hist, key=lambda r: r["b"]):
            if cum + r["cnt"] >= k:
                b = r["b"]
                lo, hi = lo + b * w, min(hi, lo + (b + 1) * w - 1)
                k -= cum
                break
            cum += r["cnt"]
    vals = (df.where(c.between(lo, hi))
            .groupBy(c.alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("v").collect())
    cum = 0
    for r in vals:
        cum += r["cnt"]
        if cum >= k:
            return r["v"]
    raise AssertionError("unreachable: k within counted range")


def temporal_split_embargo(df: DataFrame, ts_col: str = "ts",
                           train_frac: float = 0.8,
                           embargo_us: int = 0) -> DataFrame:
    """Purged temporal train/test split (the time-series leakage
    control, cf. Lopez de Prado 2018): the train/test boundary is the
    EXACT ``train_frac`` order statistic of the event time (computed
    distributed via :func:`exact_kth_int` — no global sort, no
    approximation), and rows inside the ``embargo_us`` gap after the
    boundary are assigned to neither side — so models trained on
    ``train`` never see information that leaks across the boundary
    through lookahead windows. Tie semantics are value-based: every
    row sharing the cutoff timestamp is train (a timestamp cannot
    straddle the boundary). Adds ``split`` in (train, embargo, test);
    the assignment itself is map-side (two broadcast literals)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    staged = df.withColumn("__us", us)
    # one stats pass serves both the row count and the selection bounds
    row = staged.agg(F.min("__us").alias("lo"), F.max("__us").alias("hi"),
                     F.count("__us").alias("n")).first()
    n = row["n"]
    if n == 0:
        return staged.select(*df.columns,
                             F.lit("train").alias("split")).where(F.lit(False))
    k = max(int(train_frac * n), 1)
    cutoff = exact_kth_int(staged, "__us", k,
                           bounds=(row["lo"], row["hi"], n))
    split = (F.when(F.col("__us") <= cutoff, "train")
             .when(F.col("__us") <= cutoff + embargo_us, "embargo")
             .otherwise("test"))
    return staged.select(*df.columns, split.alias("split"))


def dp_noisy_counts(df: DataFrame, group_col: str, epsilon: float = 1.0,
                    seed: str = "dp0", keep_true: bool = False) -> DataFrame:
    """Differentially-private group counts via the Laplace mechanism
    (sensitivity 1, scale ``1/epsilon``), with DETERMINISTIC seeded
    noise: the uniform draw is the group key's 60-bit md5 hash mapped
    to the open interval (0,1) as ``(h>>9 + 0.5) / 2^51`` (exact in
    binary — both half-integers below 2^51 and the power-of-two divide
    are lossless), pushed through the Laplace inverse CDF
    ``-b·sgn(u−½)·ln(1−2|u−½|)``. Seeded determinism makes releases
    reproducible and REPLAYABLE in any SQL engine — the usual DP-noise
    testing problem (nondeterministic output, untestable pipeline)
    disappears.

    PRIVACY CAVEAT — the formal epsilon-DP guarantee holds ONLY if the
    seed is secret and never reused: the noise here is a function of
    (seed, group key) alone, so two releases over neighboring datasets
    under the SAME seed receive identical noise draws and their
    difference reveals the true delta exactly (unbounded privacy loss
    for an adversary comparing releases, or one who learns the seed).
    Use the seeded path for testing/replay/oracle verification; for a
    real release draw a fresh cryptographic seed per release (or swap
    in non-seeded randomness) and never publish or reuse it.

    One grouped count, map-side noise. ``keep_true`` retains the raw
    count for calibration tests — leave False for actual releases.
    Output: ``(group_col, [n], noisy_n)``."""
    from otit_swt_spark.pipelines.dedup import seeded_uniform

    b = 1.0 / epsilon
    u = seeded_uniform(F.concat(F.lit(seed + ":"),
                                F.col(group_col).cast("string")))
    p = F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    noise = -F.lit(b) * F.signum(u - F.lit(0.5)) * F.log(p)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    out = counts.withColumn(
        "noisy_n", F.round(F.col("n") + noise, 6))
    if keep_true:
        return out.select(group_col, "n", "noisy_n")
    return out.select(group_col, "noisy_n")


def cumulative_distinct(events: DataFrame, key: str = "user_id",
                        ts: str = "ts") -> DataFrame:
    """Exact cumulative distinct count over time (the "total users to
    date" growth curve): mark each key's FIRST day (one shuffle keyed
    on the key), count first-appearances per day, and running-sum over
    the (tiny) per-day frame — exact without ever holding a distinct
    set in state, and incremental by construction (yesterday's curve
    never changes). Output: ``(day, n_new, n_cumulative)``."""
    from pyspark.sql import Window as W

    day = F.to_date(F.col(ts).cast("timestamp")).alias("day")
    first_day = (events.select(F.col(key).alias("k"), day)
                 .groupBy("k").agg(F.min("day").alias("day")))
    daily = first_day.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select("day", "n_new",
                        F.sum("n_new").over(w).alias("n_cumulative"))


def growth_accounting(events: DataFrame, key: str = "user_id",
                      ts: str = "ts") -> DataFrame:
    """Growth accounting (the new/retained/resurrected/churned ledger):
    for each day, users active that day split into NEW (first ever
    appearance), RETAINED (also active the previous day) and
    RESURRECTED (seen before, but not the previous day); CHURNED counts
    users active the previous day who did not return. The identity
    ``active_today = new + retained + resurrected`` holds row-wise.

    One distinct (key, day) shuffle, one key-partitioned lag window,
    one grouped count — no self-joins, no distinct sets in state.
    Output: ``(day, n_active, n_new, n_retained, n_resurrected,
    n_churned)``."""
    kd = (events.select(F.col(key).alias("k"),
                        F.to_date(F.col(ts).cast("timestamp"))
                        .alias("day")).distinct())
    return growth_ledger(activity_flags(kd))


def activity_flags(kd: DataFrame) -> DataFrame:
    """Per-(key, day) activity flags — each active day paired with the
    key's previous and next active day (one lag/lead window). The
    intermediate the streaming sink stores per key, so late days can
    re-derive a key's flags exactly."""
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("day")
    return (kd.withColumn("__prev", F.lag("day").over(w))
            .withColumn("__next", F.lead("day").over(w)))


def growth_ledger(flags: DataFrame) -> DataFrame:
    """Per-day new/retained/resurrected/churned ledger from an
    :func:`activity_flags` frame (shared by the batch operator and the
    streaming sink's finalize)."""
    # NULL-safe flag sums: a NULL lag/lead makes the raw comparison
    # NULL, and an all-NULL sum is NULL, not 0 (bit the first day)
    def _n(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    per_day = (flags.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        _n(F.col("__prev").isNull()).alias("n_new"),
        _n(F.col("__prev") == F.date_sub(F.col("day"), 1))
        .alias("n_retained"),
        _n(F.col("__prev").isNotNull()
           & (F.col("__prev") < F.date_sub(F.col("day"), 1)))
        .alias("n_resurrected"),
        _n(F.col("__next").isNull()
           | (F.col("__next") > F.date_add(F.col("day"), 1)))
        .alias("__lost_after")))
    # churned on day D = users active D-1 whose next active day != D.
    # FULL outer join: a day with zero active users still owes a churn
    # row (everyone active the day before left), which a left join
    # would silently drop
    lost = per_day.select(F.date_add(F.col("day"), 1).alias("day"),
                          F.col("__lost_after").alias("n_churned"))
    return (per_day.join(lost, "day", "full")
            .select("day",
                    *[F.coalesce(c, F.lit(0)).alias(c)
                      for c in ("n_active", "n_new", "n_retained",
                                "n_resurrected", "n_churned")])
            .orderBy("day"))


_POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238463,
                 0.9963401531726563, 0.9994058151824183,
                 0.999916758850712, 0.9999897508033253,
                 0.999998874797402, 0.9999998885745216)


def bootstrap_mean_ci(df: DataFrame, value_col: str, id_col: str,
                      b: int = 64, alpha: float = 0.05,
                      seed: str = "bs0") -> DataFrame:
    """Distributed bootstrap confidence interval for the mean via the
    POISSON BOOTSTRAP (Chamandy et al. 2012, Google's "Estimating
    uncertainty for massive data streams"): instead of resampling n
    rows with replacement (impossible to coordinate across executors),
    each row independently enters replicate ``r`` with multiplicity
    ``Poisson(1)`` — here drawn DETERMINISTICALLY by inverting the
    Poisson CDF on an md5-seeded uniform per (row, replicate), so the
    whole procedure replays bit-for-bit in any engine and rotates with
    ``seed``. Replicate means use DECIMAL-exact weighted sums; the CI
    is the empirical alpha/2 .. 1-alpha/2 band over the ``b`` replicate
    means (exact order statistics on a b-row frame).

    Cost: ONE md5 per input row (not per row x replicate — the row's
    32-bit digest is stretched into the ``b`` per-replicate uniforms by
    per-replicate affine maps ``(a_r·h + c_r) mod 2^51``, odd
    ``a_r < 2^31`` drawn from ``Random(seed)`` so products stay inside
    int64 under ANSI overflow checks; every step is exact integer /
    power-of-two-divide arithmetic, so the whole procedure still
    replays bit-for-bit in SQL), then a map-side explode to b·n
    weighted rows and one grouped aggregate to b rows — no shuffling of
    resampled DATA, which is the whole point of the Poisson trick at
    scale. Output one row: ``(b, n, mean, ci_lo, ci_hi)``."""
    import random

    from pyspark.sql import Window as W

    rng = random.Random(seed)
    a_c = [(rng.randrange(0, 1 << 30) * 2 + 1, rng.randrange(0, 1 << 31))
           for _ in range(b)]
    two51 = 1 << 51

    reps = F.explode(F.array(*[F.lit(r) for r in range(b)])).alias("__r")
    base = df.select(F.col(id_col).cast("string").alias("__id"),
                     F.col(value_col).cast("double").alias("__v"))
    h32 = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col("__id"))), 1, 8),
        16, 10).cast("long")
    rows = base.withColumn("__h", h32).select("__h", "__v", reps)
    a_arr = F.array(*[F.lit(a) for a, _ in a_c])
    c_arr = F.array(*[F.lit(c) for _, c in a_c])
    mix = (F.element_at(a_arr, F.col("__r") + 1) * F.col("__h")
           + F.element_at(c_arr, F.col("__r") + 1)) % F.lit(two51)
    u = (mix.cast("double") + F.lit(0.5)) / F.lit(float(two51))
    wexpr = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        wexpr = F.when(u <= F.lit(_POISSON1_CDF[k]), F.lit(k)) \
            .otherwise(wexpr)
    dec = "decimal(38,12)"
    means = (rows.withColumn("__w", wexpr)
             .groupBy("__r")
             .agg(F.sum((F.col("__w") * F.col("__v")).cast(dec))
                  .alias("__wv"),
                  F.sum(F.col("__w").cast(dec)).alias("__ws"))
             .where(F.col("__ws").cast("double") > 0.0)
             .select("__r", (F.col("__wv").cast("double")
                             / F.col("__ws").cast("double"))
                     .alias("__m")))
    r_lo = int(alpha / 2 * b) + 1
    r_hi = b - int(alpha / 2 * b)
    ranked = means.withColumn(
        "__rk", F.row_number().over(W.partitionBy().orderBy("__m", "__r")))
    stats = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col(value_col).cast(dec)).alias("__s"))
    band = (ranked.agg(
        F.max(F.when(F.col("__rk") == r_lo, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__rk") == r_hi, F.col("__m"))).alias("__hi")))
    return (stats.crossJoin(F.broadcast(band))
            .select(F.lit(b).alias("b"), "n",
                    F.round(F.col("__s").cast("double")
                            / F.col("n").cast("double"), 6).alias("mean"),
                    (F.round("__lo", 6) + F.lit(0.0)).alias("ci_lo"),
                    (F.round("__hi", 6) + F.lit(0.0)).alias("ci_hi")))


def kaplan_meier(events: DataFrame, key: str = "user_id",
                 ts: str = "ts", censor_days: int = 7) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetimes (churn analysis):
    a user's lifetime runs from first to last activity day; users
    still active within ``censor_days`` of the corpus end are
    right-CENSORED (they leave the risk set without counting as a
    death — the estimator's whole point). At each death time ``t``:
    ``S(t) = Π (1 − d_i / n_i)`` over death times ≤ t, computed as
    ``exp(cumsum(ln(1 − d/n)))`` with the cumulative sum ordered by
    time — a deterministic fold both engines replay identically.

    One grouped pass for lifetimes, one tiny per-duration frame for
    the product (windows run over distinct durations, not users).
    Output: ``(duration_days, n_at_risk, n_deaths, survival)``."""
    from pyspark.sql import Window as W

    day = F.to_date(F.col(ts).cast("timestamp"))
    lives = (events.select(F.col(key).alias("k"), day.alias("d"))
             .groupBy("k")
             .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d")))
    horizon = lives.agg(F.max("last_d").alias("__h"))
    staged = (lives.crossJoin(F.broadcast(horizon))
              .select(F.datediff("last_d", "first_d").alias("dur"),
                      (F.datediff("__h", "last_d") < censor_days)
                      .alias("censored")))
    per_dur = (staged.groupBy("dur")
               .agg(F.sum(F.when(~F.col("censored"), 1).otherwise(0))
                    .alias("n_deaths"),
                    F.count(F.lit(1)).alias("n_total")))
    w_risk = (W.orderBy(F.col("dur").desc())
              .rowsBetween(W.unboundedPreceding, 0))
    w_surv = (W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0))
    # terminal duration where everyone at risk dies: 1 - d/n = 0 and
    # ln(0) poisons the fold (NULL in Spark, an error in some engines)
    # — force survival to exactly 0.0 from the first full-death time on
    curve = (per_dur
             .withColumn("n_at_risk", F.sum("n_total").over(w_risk))
             .where(F.col("n_deaths") > 0)
             .withColumn("__dead", (F.col("n_deaths")
                                    >= F.col("n_at_risk")).cast("int"))
             .withColumn("__ln",
                         F.when(F.col("__dead") == 0,
                                F.log(F.lit(1.0) - F.col("n_deaths")
                                      / F.col("n_at_risk")
                                      .cast("double")))
                         .otherwise(F.lit(0.0)))
             .withColumn("survival",
                         F.when(F.max("__dead").over(w_surv) == 1,
                                F.lit(0.0))
                         .otherwise(F.round(
                             F.exp(F.sum("__ln").over(w_surv)), 6))))
    return curve.select("dur", "n_at_risk", "n_deaths", "survival") \
        .withColumnRenamed("dur", "duration_days")


def two_phase_row_number(df: DataFrame, val: str, tie: str, out: str,
                         lo: float, hi: float, descending: bool = False,
                         n_buckets: int = 1024) -> DataFrame:
    """Distributed global ``row_number() OVER (ORDER BY val [DESC],
    tie)`` — bit-identical to the naive window but with NO
    unpartitioned WindowExec, so it scales past |frame| = one executor.

    Two exactly-equivalent phases (the ``token_budget_select``
    pattern, sampling.py): quantize ``val`` into ``n_buckets`` range
    buckets (monotone: FP division by a positive constant preserves
    order, equal values share a bucket); prefix-count the TINY
    per-bucket frame (<= n_buckets rows — the only global window);
    then global rank = broadcast bucket offset + a PER-BUCKET
    row_number; any real metric distribution spreads the work across
    buckets.

    Degenerate-range fallback (round 9): when ``hi <= lo`` — every
    value identical, detectable for FREE from the bounds the caller
    already computed — value-range bucketing would put the whole frame
    in one bucket (the documented single-partition floor). Instead the
    frame is range-partitioned on the FULL sort key (val, tie) and
    ranked as partition offset + per-partition row_number: same total
    order, same output, no single-task window. The staged frame is
    localCheckpoint'ed so the sampled range boundaries (and thus
    partition ids) are computed exactly once.

    ``lo``/``hi`` are the caller-supplied value bounds (compute all
    metrics' bounds in ONE driver ``first()``)."""
    from pyspark.sql import Window as W

    vorder = F.col(val).desc() if descending else F.col(val).asc()
    if float(hi) <= float(lo):
        parts = min(n_buckets, 64)
        staged = (df.repartitionByRange(parts, vorder, F.col(tie))
                  .withColumn("__pid", F.spark_partition_id())
                  .localCheckpoint())
        wb = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
        prefix = (staged.groupBy("__pid")
                  .agg(F.count(F.lit(1)).alias("__pn"))
                  .withColumn("__off",
                              F.coalesce(F.sum("__pn").over(wb), F.lit(0)))
                  .select("__pid", "__off"))
        ww = W.partitionBy("__pid").orderBy(vorder, F.col(tie))
        return (staged.join(F.broadcast(prefix), "__pid")
                .withColumn(out, F.col("__off") + F.row_number().over(ww))
                .drop("__pid", "__off"))

    width = (float(hi) - float(lo)) / n_buckets or 1.0
    b = F.least(F.floor((F.col(val) - F.lit(float(lo))) / F.lit(width)),
                F.lit(n_buckets - 1)).cast("int")
    bucketed = df.withColumn("__b", b)
    border = F.desc("__b") if descending else F.asc("__b")
    wb = W.orderBy(border).rowsBetween(W.unboundedPreceding, -1)
    prefix = (bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__bn"))
              .withColumn("__off",
                          F.coalesce(F.sum("__bn").over(wb), F.lit(0)))
              .select("__b", "__off"))
    vorder = F.col(val).desc() if descending else F.col(val).asc()
    ww = W.partitionBy("__b").orderBy(vorder, F.col(tie))
    return (bucketed.join(F.broadcast(prefix), "__b")
            .withColumn(out, F.col("__off") + F.row_number().over(ww))
            .drop("__b", "__off"))


def rfm_segments(events: DataFrame, key: str = "user_id",
                 ts: str = "ts", value: str = "value",
                 n_bins: int = 5) -> DataFrame:
    """RFM segmentation: per key, Recency (days since last activity,
    against the corpus max day), Frequency (event count) and Monetary
    (summed value, DECIMAL-exact), each scored into ``n_bins``
    rank-based bins — score ``ceil(n_bins·rank/n)`` with deterministic
    (metric, key) tie-breaks, so the binning is exact and
    engine-replayable where ``ntile`` tie behavior is not. Recency
    ranks DESCENDING (most recent = highest score), frequency/monetary
    ascending. Output: one row per key with the three raw metrics,
    three scores, and the concatenated segment label.

    One grouped pass over events; the three rank passes run on the
    per-key aggregate frame via :func:`two_phase_row_number` (bucketed
    offsets + per-bucket windows — no single-partition WindowExec over
    the |keys| frame), with all metric bounds and the horizon read in
    ONE driver ``first()``.

    NULL contract: keys whose recency or monetary metric is NULL
    (every ts unparseable / every value NULL for that key) are DROPPED
    — a key with no dateable activity or no monetary signal has no
    defined rank position, and carrying it would poison the bucket
    histograms (NULL buckets) and the horizon math."""
    day = F.to_date(F.col(ts).cast("timestamp"))
    agg = (events.groupBy(F.col(key).alias("k"))
           .agg(F.max(day).alias("last_day"),
                F.count(F.lit(1)).alias("frequency"),
                F.sum(F.col(value).cast("decimal(38,12)")).alias("__m"))
           .withColumn("monetary",
                       F.round(F.col("__m").cast("double"), 6))
           .drop("__m")
           .where(F.col("last_day").isNotNull()
                  & F.col("monetary").isNotNull()))
    bounds = agg.agg(
        F.max("last_day").alias("h"), F.min("last_day").alias("d0"),
        F.min("frequency").alias("f0"), F.max("frequency").alias("f1"),
        F.min("monetary").alias("m0"), F.max("monetary").alias("m1"),
        F.count(F.lit(1)).alias("n")).first()
    if bounds["n"] == 0 or bounds["h"] is None:
        empty = agg.select(
            F.col("k").alias(key),
            F.lit(0).alias("recency"), "frequency", "monetary",
            F.lit(0).alias("r_score"), F.lit(0).alias("f_score"),
            F.lit(0).alias("m_score"), F.lit("").alias("segment"))
        return empty.limit(0)
    staged = agg.select(
        "k", F.datediff(F.lit(bounds["h"]), "last_day").alias("recency"),
        "frequency", "monetary")
    n = bounds["n"]
    max_rec = (bounds["h"] - bounds["d0"]).days

    # All three metrics bucketed on ONE frame; the three <=1024-row
    # bucket-prefix maps are computed from ONE extra aggregate job
    # (explode into (metric, bucket) pairs, count, collect <=3072 rows)
    # and re-attached as broadcast joins — the final plan scans and
    # aggregates events exactly once, where per-metric DataFrame
    # branches would replicate the scan+agg subtree (column pruning
    # makes the branch exchanges non-identical, defeating
    # ReuseExchange).
    from pyspark.sql import Window as W

    def bucket(col, lo, hi):
        width = (float(hi) - float(lo)) / 1024 or 1.0
        return F.least(F.floor((F.col(col) - F.lit(float(lo)))
                               / F.lit(width)),
                       F.lit(1023)).cast("int")

    bucketed = (staged
                .withColumn("__br", bucket("recency", 0, max_rec))
                .withColumn("__bf", bucket("frequency", bounds["f0"],
                                           bounds["f1"]))
                .withColumn("__bm", bucket("monetary", bounds["m0"],
                                           bounds["m1"])))
    hist = (bucketed.select(F.explode(F.array(
                F.struct(F.lit("r").alias("m"), F.col("__br").alias("b")),
                F.struct(F.lit("f").alias("m"), F.col("__bf").alias("b")),
                F.struct(F.lit("m").alias("m"), F.col("__bm").alias("b"))))
            .alias("e"))
            .groupBy("e.m", "e.b").agg(F.count(F.lit(1)).alias("n"))
            .collect())
    spark = bucketed.sparkSession
    pre = {}
    for metric, descending in (("r", True), ("f", False), ("m", False)):
        rows = sorted(((r["b"], r["n"]) for r in hist
                       if r["m"] == metric), reverse=descending)
        acc, offs = 0, []
        for bkt, cnt in rows:
            offs.append((bkt, acc))
            acc += cnt
        pre[metric] = offs
    staged = (bucketed
              .join(F.broadcast(spark.createDataFrame(
                    pre["r"], "__br int, __or bigint")), "__br")
              .join(F.broadcast(spark.createDataFrame(
                    pre["f"], "__bf int, __of bigint")), "__bf")
              .join(F.broadcast(spark.createDataFrame(
                    pre["m"], "__bm int, __om bigint")), "__bm"))
    wr = W.partitionBy("__br").orderBy(F.col("recency").desc(), "k")
    wf = W.partitionBy("__bf").orderBy(F.col("frequency").asc(), "k")
    wm = W.partitionBy("__bm").orderBy(F.col("monetary").asc(), "k")
    staged = (staged
              .withColumn("__rr", F.col("__or") + F.row_number().over(wr))
              .withColumn("__rf", F.col("__of") + F.row_number().over(wf))
              .withColumn("__rm", F.col("__om") + F.row_number().over(wm)))

    def score(rk, name):
        return (F.ceil(F.lit(n_bins) * F.col(rk) / F.lit(float(n)))
                .cast("int").alias(name))

    return staged.select(
        F.col("k").alias(key), "recency", "frequency", "monetary",
        score("__rr", "r_score"), score("__rf", "f_score"),
        score("__rm", "m_score")) \
        .withColumn("segment",
                    F.concat_ws("-", "r_score", "f_score", "m_score"))


def chi_square_independence(df: DataFrame, col_a: str,
                            col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the feature-vs-label dependency screen (is event type
    independent of weekday? is source independent of language?).
    Uses the zero-cell-free identity ``chi2 = sum(c^2/e) - N`` over the
    OBSERVED cells only (every unobserved cell's expected mass is
    absorbed by the -N term), so the plan never materializes the full
    R x C grid: one grouped count per margin plus the cell counts, two
    broadcast margin joins, a one-row total. Per-cell terms are exact
    integer ratios evaluated in double and summed in DECIMAL(38,12)
    (order-independent); dof = (R-1)(C-1). Output one row:
    ``(chi2, dof, n)``.

    NULL contract: rows where EITHER column is NULL are excluded up
    front — NULL is "category unobserved", not a category. (Keeping
    them would silently corrupt the statistic: the grouped count keeps
    a NULL cell in ``n`` while the equi-joins on a/b drop it from the
    chi2 sum and countDistinct drops it from dof, so chi2 could go
    negative.)"""
    cells = (df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
             .agg(F.count(F.lit(1)).alias("c")))
    ra = cells.groupBy("a").agg(F.sum("c").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("c").alias("cb"))
    tot = cells.agg(F.sum("c").alias("n"),
                    F.countDistinct("a").alias("nr"),
                    F.countDistinct("b").alias("nc"))
    term = ((F.col("c").cast("double") * F.col("c").cast("double")
             * F.col("n").cast("double"))
            / (F.col("ra").cast("double") * F.col("cb").cast("double")))
    joined = (cells.join(F.broadcast(ra), "a")
              .join(F.broadcast(cb), "b")
              .crossJoin(F.broadcast(tot)))
    agg = joined.agg(
        F.sum(term.cast("decimal(38,12)")).alias("s"),
        F.max("n").alias("n"), F.max("nr").alias("nr"),
        F.max("nc").alias("nc"))
    return agg.select(
        (F.round(F.col("s").cast("double") - F.col("n").cast("double"), 6)
         + F.lit(0.0)).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"))


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-annotator agreement
    between two categorical labelers over the same items: the labeled-
    data QA gate a training pipeline runs before trusting human (or
    model-as-judge) labels. κ = (p_o − p_e)/(1 − p_e) with p_o the
    observed agreement rate and p_e the expected-by-chance rate from the
    per-annotator marginals.

    Evaluated as the INTEGER identity
    ``κ = (n·agree − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k)`` so every input
    to the one final division is an exact integer — no float-summation
    order anywhere, which is what lets a SQL oracle replay the statistic
    bit-for-bit. Plan: one grouped count per marginal (map-side combine),
    a broadcast join of the two tiny marginal frames on the category,
    one row out ``(n, po, pe, kappa)``. NULL contract matches
    chi_square_independence: a NULL label on either side excludes the
    item. Degenerate corpus where p_e = 1 (both annotators constant and
    equal) returns kappa NULL (0/0 has no chance correction to apply)."""
    pairs = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull()) \
        .select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .alias("agree"))
    ra = pairs.groupBy(F.col("a").alias("k")).agg(F.count(F.lit(1)).alias("rk"))
    cb = pairs.groupBy(F.col("b").alias("k")).agg(F.count(F.lit(1)).alias("ck"))
    chance = (ra.join(cb, "k")
              .agg(F.coalesce(F.sum(F.col("rk") * F.col("ck")),
                              F.lit(0)).alias("s")))
    out = tot.crossJoin(F.broadcast(chance))
    n = F.col("n").cast("double")
    po = F.col("agree").cast("double") / n
    pe = F.col("s").cast("double") / (n * n)
    kappa = ((F.col("n") * F.col("agree") - F.col("s")).cast("double")
             / (F.col("n") * F.col("n") - F.col("s")).cast("double"))
    return out.select(
        F.col("n").cast("long").alias("n"),
        (F.round(po, 6) + F.lit(0.0)).alias("po"),
        (F.round(pe, 6) + F.lit(0.0)).alias("pe"),
        F.when(F.col("n") * F.col("n") == F.col("s"), F.lit(None))
        .otherwise(F.round(kappa, 6) + F.lit(0.0)).alias("kappa"))


def krippendorff_alpha(df: DataFrame, item_col: str,
                       label_col: str) -> DataFrame:
    """Krippendorff's alpha (nominal metric) — inter-annotator agreement
    for ANY number of raters with missing labels, over long-format
    ``(item, label)`` rows (one row per assigned label; absent rows ARE
    the missing data, so no rater column is needed). The companion to
    :func:`cohens_kappa` when annotation is crowdsourced: items with
    fewer than 2 labels are excluded per the definition.

    Via the coincidence-matrix identities, everything is integer except
    the observed-agreement mass A_o = Σ_u (Σ_c cnt_u(c)² − m_u)/(m_u−1),
    a per-item rational summed in DECIMAL(38,12) (order-independent);
    the final α = 1 − (n − A_o)(n − 1) / (n(n−1) − Σ_c n_c(n_c−1)) is
    one fixed-order double expression, so a SQL oracle replays it
    bit-for-bit. Returns one row ``(n_labels, n_items, alpha)`` with
    alpha NULL when every pairable label is identical (no expected
    disagreement to correct against)."""
    cnt = (df.where(F.col(item_col).isNotNull()
                    & F.col(label_col).isNotNull())
           .groupBy(F.col(item_col).alias("u"),
                    F.col(label_col).alias("c"))
           .agg(F.count(F.lit(1)).alias("k")))
    per_item = (cnt.groupBy("u")
                .agg(F.sum("k").alias("m"),
                     F.sum(F.col("k") * F.col("k")).alias("sq"))
                .where(F.col("m") >= 2))
    ao_term = ((F.col("sq") - F.col("m")).cast("double")
               / (F.col("m") - 1).cast("double"))
    totals = per_item.agg(
        F.sum("m").alias("n"),
        F.count(F.lit(1)).alias("items"),
        F.sum(ao_term.cast("decimal(38,12)")).alias("ao"))
    nc = (cnt.join(per_item.select("u"), "u", "left_semi")
          .groupBy("c").agg(F.sum("k").alias("nc"))
          .agg(F.coalesce(F.sum(F.col("nc") * (F.col("nc") - 1)),
                          F.lit(0)).alias("snn")))
    out = totals.crossJoin(F.broadcast(nc))
    n = F.col("n").cast("double")
    denom = n * (n - 1) - F.col("snn").cast("double")
    alpha = 1 - ((n - F.col("ao").cast("double")) * (n - 1)) / denom
    return out.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_labels"),
        F.col("items").cast("long").alias("n_items"),
        F.when(denom == 0, F.lit(None))
        .otherwise(F.round(alpha, 6) + F.lit(0.0)).alias("alpha"))


def kendall_tau_b(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Kendall's tau-b — rank correlation between two ORDINAL raters
    (quality tiers, 1-5 ratings, curriculum deciles) over the same
    items: the IAA gate for ordered labels, where kappa's all-or-
    nothing agreement wastes the ordering. Ties are corrected on both
    margins (the -b variant).

    Computed from the CONTINGENCY TABLE, not item pairs: concordant /
    discordant masses are Σ n_xy·n_x'y' over cell pairs strictly
    ordered the same/opposite way on both axes — one grouped count
    (map-side combine) plus a broadcast self-join of the tiny k×k cell
    frame, never an O(n²) item join, so the statistic runs at corpus
    scale for any bounded label alphabet. Every input to
    τ = (C − D)/(√(n₀−n₁)·√(n₂ diff)) is an exact integer (n₀ =
    n(n−1)/2, n₁/n₂ the per-margin tie masses); the two square roots
    are taken BEFORE multiplying so nothing exceeds the 2^53 double-
    exact range at any realistic n, and the identical fixed expression
    replays bit-for-bit in a SQL oracle. NULL on either side excludes
    the item; τ is NULL when either margin is constant (no order
    information). Values must CAST to a comparable type — pass numeric
    ordinals, not label strings, when the order matters.

    Returns one row ``(n, concordant, discordant, tau_b)``."""
    pairs = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull()) \
        .select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    cells = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("k"))
    x, y = cells.alias("x"), cells.alias("y")
    conc = (x.join(F.broadcast(y),
                   (F.col("y.a") > F.col("x.a"))
                   & (F.col("y.b") > F.col("x.b")))
            .agg(F.coalesce(F.sum(F.col("x.k") * F.col("y.k")),
                            F.lit(0)).alias("c")))
    disc = (x.join(F.broadcast(y),
                   (F.col("y.a") > F.col("x.a"))
                   & (F.col("y.b") < F.col("x.b")))
            .agg(F.coalesce(F.sum(F.col("x.k") * F.col("y.k")),
                            F.lit(0)).alias("d")))
    ta = (cells.groupBy("a").agg(F.sum("k").alias("m"))
          .agg(F.coalesce(F.sum(F.col("m") * (F.col("m") - 1)),
                          F.lit(0)).alias("t1")))
    tb = (cells.groupBy("b").agg(F.sum("k").alias("m"))
          .agg(F.coalesce(F.sum(F.col("m") * (F.col("m") - 1)),
                          F.lit(0)).alias("t2")))
    tot = pairs.agg(F.count(F.lit(1)).alias("n"))
    out = (tot.crossJoin(F.broadcast(conc)).crossJoin(F.broadcast(disc))
           .crossJoin(F.broadcast(ta)).crossJoin(F.broadcast(tb)))
    # n0/n1/n2 carry a uniform factor 2 (n(n-1), Σm(m-1)); each sqrt
    # then carries √2, so the numerator takes the matching factor 2
    n0 = (F.col("n") * (F.col("n") - 1)).cast("double")
    den_a = n0 - F.col("t1").cast("double")
    den_b = n0 - F.col("t2").cast("double")
    tau = ((2 * (F.col("c") - F.col("d"))).cast("double")
           / (F.sqrt(den_a) * F.sqrt(den_b)))
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.when((den_a == 0) | (den_b == 0), F.lit(None))
        .otherwise(F.round(tau, 6) + F.lit(0.0)).alias("tau_b"))


def mcnemar_test(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """McNemar's test on paired binary outcomes — the A/B gate for two
    FILTERS or classifiers judged on the same documents (did switching
    the quality filter actually change decisions, or just shuffle
    errors symmetrically?). Only the DISCORDANT counts matter:
    b = |a-pass ∧ b-fail|, c = |a-fail ∧ b-pass|, χ² = (b−c)²/(b+c)
    (1 df, without continuity correction — the classic form).

    One grouped flag-sum pass, exact integers into a single division
    (bit-for-bit SQL replay); χ² is NULL when b+c = 0 (the two systems
    never disagree — no test to run). NULL on either side excludes the
    pair. Returns ``(n, both_pass, only_a, only_b, chi2)``."""
    pairs = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull()) \
        .select(F.col(col_a).cast("boolean").alias("a"),
                F.col(col_b).cast("boolean").alias("b"))
    flag = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    out = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        flag(F.col("a") & F.col("b")).alias("both"),
        flag(F.col("a") & ~F.col("b")).alias("only_a"),
        flag(~F.col("a") & F.col("b")).alias("only_b"))
    b, c = F.col("only_a"), F.col("only_b")
    chi2 = (((b - c) * (b - c)).cast("double") / (b + c).cast("double"))
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.coalesce(F.col("both"), F.lit(0)).cast("long").alias("both_pass"),
        F.coalesce(b, F.lit(0)).cast("long").alias("only_a"),
        F.coalesce(c, F.lit(0)).cast("long").alias("only_b"),
        F.when(F.coalesce(b + c, F.lit(0)) == 0, F.lit(None))
        .otherwise(F.round(chi2, 6) + F.lit(0.0)).alias("chi2"))


def reliability_bins(df: DataFrame, score_col: str, label_col: str,
                     bins: int = 10) -> DataFrame:
    """Reliability-diagram bins for a probabilistic scorer (model-as-
    judge / quality-classifier calibration QA): equal-width bins over
    [0,1] with per-bin count, mean confidence, empirical accuracy and
    the |acc − conf| gap — the inputs to ECE/MCE, returned as ROWS
    instead of one folded number so no cross-bin float summation exists
    anywhere (each bin is integer counts + one DECIMAL(38,12) score sum,
    which is what lets a SQL oracle replay every value bit-for-bit; the
    caller folds ECE = Σ n_b/N·gap_b if they want the scalar). Scores
    outside [0,1] raise rather than silently clamp; score 1.0 lands in
    the top bin. NULL score or label excludes the row."""
    binned = _reliability_binned(df, score_col, label_col, bins,
                                 "reliability_bins")
    out = (binned.groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col(score_col).cast("decimal(38,12)"))
                .alias(f"sum_{score_col}"),
                F.sum(label_col).alias(f"sum_{label_col}")))
    return _reliability_select(out, score_col, label_col)


def _reliability_binned(df: DataFrame, score_col: str, label_col: str,
                        bins: int, err_prefix: str) -> DataFrame:
    """Shared bin/guard projection for the batch operator and its
    streaming twin (streaming.ingest.stream_reliability_bins) — one
    definition so the two can never drift."""
    b = int(bins)
    if b < 2:
        raise ValueError(f"{err_prefix}: bins must be >= 2")
    s = F.col(score_col).cast("double")
    rows = df.where(F.col(score_col).isNotNull()
                    & F.col(label_col).isNotNull())
    guard = F.when((s < 0) | (s > 1) | F.isnan(s), F.raise_error(F.concat(
        F.lit(f"{err_prefix}: {score_col} outside [0,1]: "),
        s.cast("string"))).cast("double")).otherwise(s)
    return rows.select(
        F.least(F.floor(guard * b), F.lit(b - 1)).cast("int").alias("bin"),
        s.alias(score_col),
        F.col(label_col).cast("int").alias(label_col))


def _reliability_select(t: DataFrame, score_col: str,
                        label_col: str) -> DataFrame:
    """Shared final projection over per-bin partials ``(bin, n,
    sum_<score>, sum_<label>)`` — same fixed expression order for the
    batch operator and the streaming partials reader."""
    conf = (F.col(f"sum_{score_col}").cast("double")
            / F.col("n").cast("double"))
    acc = (F.col(f"sum_{label_col}").cast("double")
           / F.col("n").cast("double"))
    return (t.select(
        "bin", F.col("n").cast("long").alias("n"),
        (F.round(conf, 6) + F.lit(0.0)).alias("conf"),
        (F.round(acc, 6) + F.lit(0.0)).alias("acc"),
        (F.round(F.abs(acc - conf), 6) + F.lit(0.0)).alias("gap"))
        .orderBy("bin"))


def mutual_information(df: DataFrame, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information between two categorical columns, with the
    marginal entropies and the normalized coefficient — the
    feature-dependency screen that, unlike chi-square
    (:func:`chi_square_independence`), is comparable across tables:
    ``NMI = MI / min(H(a), H(b))`` is 0 for independence and 1 when
    one column determines the other.

    Same scale shape as chi2: cell counts + two broadcast margin joins
    + a one-row total — never the full R x C grid. Every term is an
    exact integer ratio evaluated in double and summed in
    DECIMAL(38,12) (order-independent), using the count-form identities
    ``MI = ln n + (1/n)·Σ c·ln(c/(ra·cb))`` and
    ``H = ln n - (1/n)·Σ m·ln m`` so each cell contributes ONE log of
    integers. NULL contract: rows with NULL in either column are
    excluded up front (same rule as chi2). Output one row:
    ``(mi, h_a, h_b, nmi, n)`` in nats, rounded to 6."""
    dec = "decimal(38,12)"
    cells = (df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
             .agg(F.count(F.lit(1)).alias("c")))
    ra = cells.groupBy("a").agg(F.sum("c").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("c").alias("cb"))
    cd = F.col("c").cast("double")
    joint = (cells.join(F.broadcast(ra), "a").join(F.broadcast(cb), "b")
             .agg(F.sum((cd * F.log(cd / (F.col("ra").cast("double")
                                          * F.col("cb").cast("double"))))
                        .cast(dec)).alias("sj"),
                  F.sum("c").alias("n")))
    ha = ra.agg(F.sum((F.col("ra").cast("double")
                       * F.log(F.col("ra").cast("double")))
                      .cast(dec)).alias("sa"))
    hb = cb.agg(F.sum((F.col("cb").cast("double")
                       * F.log(F.col("cb").cast("double")))
                      .cast(dec)).alias("sb"))
    nd = F.col("n").cast("double")
    mi = F.log(nd) + F.col("sj").cast("double") / nd
    h_a = F.log(nd) - F.col("sa").cast("double") / nd
    h_b = F.log(nd) - F.col("sb").cast("double") / nd
    out = (joint.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
           .select(mi.alias("__mi"), h_a.alias("__ha"), h_b.alias("__hb"),
                   F.col("n")))
    minh = F.least(F.col("__ha"), F.col("__hb"))
    nmi = F.when(minh > 0, F.col("__mi") / minh).otherwise(F.lit(0.0))
    return out.select(
        (F.round("__mi", 6) + F.lit(0.0)).alias("mi"),
        (F.round("__ha", 6) + F.lit(0.0)).alias("h_a"),
        (F.round("__hb", 6) + F.lit(0.0)).alias("h_b"),
        (F.round(nmi, 6) + F.lit(0.0)).alias("nmi"),
        F.col("n").cast("long").alias("n"))


def mad_anomalies(events: DataFrame, key: str = "user_id",
                  value: str = "value", id_col: str = "event_id",
                  k: float = 3.0) -> DataFrame:
    """Robust per-key outliers by median absolute deviation — the
    outlier detector that survives the outliers themselves (a single
    10^6 spike inflates a stddev-based z-score's own yardstick; the
    median and MAD barely move). Flags rows with
    ``|v - median| > k * MAD``; keys with MAD = 0 (constant-majority
    series, modified z undefined) are excluded by contract.

    Two grouped exact percentiles + two joins, all on the same key —
    one hash partitioning reused end-to-end, no windows. Output:
    ``(id_col, key, value, med, mad, deviation)``."""
    med = (events.groupBy(F.col(key).alias("__k"))
           .agg(F.expr(f"percentile({value}, 0.5)").alias("med")))
    staged = (events.select(F.col(id_col), F.col(key), F.col(value))
              .join(med, F.col(key) == F.col("__k")).drop("__k")
              .withColumn("__ad", F.abs(F.col(value) - F.col("med"))))
    mad = (staged.groupBy(F.col(key).alias("__k"))
           .agg(F.expr("percentile(__ad, 0.5)").alias("mad")))
    return (staged.join(mad, F.col(key) == F.col("__k")).drop("__k")
            .where((F.col("mad") > 0)
                   & (F.col("__ad") > F.lit(k) * F.col("mad")))
            .select(id_col, key, value,
                    (F.round("med", 6) + F.lit(0.0)).alias("med"),
                    F.round("mad", 6).alias("mad"),
                    F.round("__ad", 6).alias("deviation")))


def ks_two_sample(df: DataFrame, value: str, group: str,
                  group_a, group_b, n_buckets: int = 1024) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value`` distributions of two groups — the drift test that needs
    no binning choice (unlike PSI): D = max over observed values of
    |F_a(x) - F_b(x)|. The argmax search runs on EXACT INTEGERS
    (max |cum_a*n_b - cum_b*n_a|, one DECIMAL division at the end), so
    no float-accumulation order can move the maximum.

    Distributed shape: per-value counts, then the cumulative sums via
    the bucketed two-phase pattern (:func:`two_phase_row_number`'s
    sibling): range-bucket the value, prefix-sum the <=``n_buckets``-row
    bucket frame (the only global window), per-bucket window cumsums.
    Output one row: ``(n_a, n_b, ks)``.

    NULL contract: NULL-valued rows are excluded before counting (a
    NULL carries no position on the value axis; counting it into
    n_a/n_b while the bucket join drops it would skew D), matching
    :func:`percentile_rank`'s explicit NULL exclusion."""
    from pyspark.sql import Window as W

    v = (df.where(F.col(group).isin([group_a, group_b])
                  & F.col(value).isNotNull())
         .select(F.col(value).alias("v"),
                 F.when(F.col(group) == group_a, 1).otherwise(0)
                 .alias("__ia")))
    counts = (v.groupBy("v")
              .agg(F.sum("__ia").alias("ca"),
                   F.sum(F.lit(1) - F.col("__ia")).alias("cb")))
    b = counts.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    if b["lo"] is None:
        return counts.agg(F.lit(0).cast("long").alias("n_a"),
                          F.lit(0).cast("long").alias("n_b"),
                          F.lit(None).cast("double").alias("ks")).limit(0)
    width = (float(b["hi"]) - float(b["lo"])) / n_buckets or 1.0
    bk = F.least(F.floor((F.col("v") - F.lit(float(b["lo"])))
                         / F.lit(width)), F.lit(n_buckets - 1)).cast("int")
    bucketed = counts.withColumn("__b", bk)
    wb = W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    wtot = W.orderBy("__b").rowsBetween(W.unboundedPreceding,
                                        W.unboundedFollowing)
    prefix = (bucketed.groupBy("__b")
              .agg(F.sum("ca").alias("__ba"), F.sum("cb").alias("__bb"))
              .select("__b",
                      F.coalesce(F.sum("__ba").over(wb), F.lit(0))
                      .alias("__oa"),
                      F.coalesce(F.sum("__bb").over(wb), F.lit(0))
                      .alias("__ob"),
                      F.sum("__ba").over(wtot).alias("n_a"),
                      F.sum("__bb").over(wtot).alias("n_b")))
    ww = (W.partitionBy("__b").orderBy("v")
          .rowsBetween(W.unboundedPreceding, 0))
    cum = (bucketed.join(F.broadcast(prefix), "__b")
           .select((F.col("__oa") + F.sum("ca").over(ww)).alias("cum_a"),
                   (F.col("__ob") + F.sum("cb").over(ww)).alias("cum_b"),
                   "n_a", "n_b"))
    # scale-0 decimals: the counts are integers, and (38,0)x(38,0)
    # products stay exact where (38,12) scales would clamp
    num = F.abs(F.col("cum_a").cast("decimal(38,0)")
                * F.col("n_b").cast("decimal(38,0)")
                - F.col("cum_b").cast("decimal(38,0)")
                * F.col("n_a").cast("decimal(38,0)"))
    return (cum.agg(F.max(num).alias("__d"),
                    F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"))
            .select(F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                           F.round(F.col("__d").cast("double")
                                   / (F.col("n_a").cast("double")
                                      * F.col("n_b").cast("double")), 6))
                    .alias("ks")))


def seq_patterns(events: DataFrame, n: int = 3, key: str = "user_id",
                 ts: str = "ts", state_col: str = "event_type",
                 order_cols: list[str] | None = None,
                 top_n: int = 25) -> DataFrame:
    """Top contiguous event-type n-gram patterns ranked by SUPPORT
    (distinct keys exhibiting the pattern) — the bounded-length heart of
    sequential-pattern mining (the "view -> cart -> purchase vs
    view -> cart -> exit" question), without PrefixSpan's exponential
    candidate lattice. NULL states are dropped before pairing (the
    :func:`markov_transitions` contract). One key-partitioned window
    builds the n-gram via lead(); support and occurrence counts
    aggregate once; distributed TakeOrdered for the head."""
    from pyspark.sql import Window as W

    order = [ts, *(order_cols or [])]
    w = W.partitionBy("__k").orderBy(*order)
    seq = (events.where(F.col(state_col).isNotNull())
           .select(F.col(key).alias("__k"), *[F.col(c) for c in order],
                   F.col(state_col).alias("s0")))
    cols = ["s0"]
    for i in range(1, n):
        seq = seq.withColumn(f"s{i}", F.lead("s0", i).over(w))
        cols.append(f"s{i}")
    grams = seq.where(F.col(f"s{n-1}").isNotNull())
    agg = (grams.groupBy(*cols)
           .agg(F.countDistinct("__k").alias("support"),
                F.count(F.lit(1)).alias("n_occurrences")))
    return (agg.select(F.concat_ws(" -> ", *cols).alias("pattern"),
                       "support", "n_occurrences")
            .orderBy(F.col("support").desc(),
                     F.col("n_occurrences").desc(), "pattern")
            .limit(top_n))


def percentile_rank(df: DataFrame, value_col: str, tie_col: str,
                    n_buckets: int = 1024) -> DataFrame:
    """Percentile-rank transform: every row's position quantile
    ``(rank - 1) / (n - 1)`` under the deterministic total order
    (value, tie) — the rank-based feature scaling (quantile
    normalization's first half) that is immune to outliers where
    min-max scaling is not. Rank is :func:`two_phase_row_number`
    (range-bucketed offsets + per-bucket windows), so the transform of
    an arbitrarily large frame never funnels through one WindowExec
    partition — the operator the naive ``percent_rank() OVER ()``
    cannot be at scale. NULL values are excluded (no position in the
    order). Output: input columns + ``pct_rank`` in [0, 1]; single-row
    inputs get 0.0."""
    staged = df.where(F.col(value_col).isNotNull())
    b = staged.agg(F.min(value_col).alias("lo"),
                   F.max(value_col).alias("hi"),
                   F.count(F.lit(1)).alias("n")).first()
    if b["n"] == 0:
        return staged.withColumn("pct_rank", F.lit(None).cast("double"))
    ranked = two_phase_row_number(staged, value_col, tie_col, "__rn",
                                  b["lo"], b["hi"], n_buckets=n_buckets)
    denom = float(max(b["n"] - 1, 1))
    return ranked.withColumn(
        "pct_rank",
        F.round((F.col("__rn") - 1) / F.lit(denom), 6)).drop("__rn")


def weighted_median(df: DataFrame, value_col: str, weight_col: str,
                    n_buckets: int = 1024) -> DataFrame:
    """EXACT lower weighted median: the smallest value whose cumulative
    weight reaches half the total — the size-aware center ("the price
    where half the QUANTITY sits", "the doc length where half the
    TOKENS sit") that the unweighted median misstates whenever weight
    correlates with value. The test is ``2·cumw >= W`` on DECIMAL-exact
    sums (never a float halving), and the cumulative pass uses the
    bucketed two-phase pattern over the per-value weight frame — no
    unbounded global window, no sort of the raw rows. NULL values and
    NULL/non-positive weights are excluded. Output one row:
    ``(n_rows, total_weight, weighted_median)``."""
    from pyspark.sql import Window as W

    dec = "decimal(38,6)"
    staged = (df.where(F.col(value_col).isNotNull()
                       & (F.col(weight_col) > 0))
              .select(F.col(value_col).cast("double").alias("v"),
                      F.col(weight_col).cast(dec).alias("w")))
    pv = (staged.groupBy("v")
          .agg(F.sum("w").alias("w"), F.count(F.lit(1)).alias("c")))
    b = pv.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    if b["lo"] is None:
        return pv.agg(F.lit(0).cast("long").alias("n_rows"),
                      F.lit(None).cast("double").alias("total_weight"),
                      F.lit(None).cast("double")
                      .alias("weighted_median")).limit(0)
    width = (float(b["hi"]) - float(b["lo"])) / n_buckets or 1.0
    bk = F.least(F.floor((F.col("v") - F.lit(float(b["lo"])))
                         / F.lit(width)), F.lit(n_buckets - 1)).cast("int")
    bucketed = pv.withColumn("__b", bk)
    wb = W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    wtot = W.orderBy("__b").rowsBetween(W.unboundedPreceding,
                                        W.unboundedFollowing)
    prefix = (bucketed.groupBy("__b").agg(F.sum("w").alias("__bw"))
              .select("__b",
                      F.coalesce(F.sum("__bw").over(wb),
                                 F.lit(0).cast(dec)).alias("__off"),
                      F.sum("__bw").over(wtot).alias("__tw")))
    ww = (W.partitionBy("__b").orderBy("v")
          .rowsBetween(W.unboundedPreceding, 0))
    cum = (bucketed.join(F.broadcast(prefix), "__b")
           .withColumn("__cw", F.col("__off") + F.sum("w").over(ww)))
    hit = cum.where(F.lit(2) * F.col("__cw") >= F.col("__tw"))
    return (cum.agg(F.sum("c").alias("n_rows"),
                    F.max("__tw").alias("tw"))
            .crossJoin(F.broadcast(
                hit.agg(F.min("v").alias("wm"))))
            .select(F.col("n_rows").cast("long").alias("n_rows"),
                    F.round(F.col("tw").cast("double"), 6)
                    .alias("total_weight"),
                    F.round("wm", 6).alias("weighted_median")))
