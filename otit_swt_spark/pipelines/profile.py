"""Data profiling and expectation validation — the data-quality gate a
100 TB ingest pipeline runs before training ever sees the data
(great-expectations-style, reduced to engine primitives).

- :func:`profile_table` computes per-column completeness / cardinality /
  range stats in ONE aggregation pass (all columns' aggregates in a single
  ``agg``, so the table is scanned once; Spark plans multiple DISTINCT
  aggregates via expand, still one shuffle round).
- :func:`validate` evaluates named boolean expectations in one pass and
  returns violation counts per rule — conditional counts, no per-rule jobs.
- :func:`fk_violations` counts referential-integrity breaks with a
  left-anti join (broadcast when the dimension side is small).

All outputs are tiny (rows = columns or rules), whatever the input size.
Additive — the reference has no profiling surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """One row per column: ``(col, n, n_null, n_distinct, min_str,
    max_str, mean)``. min/max are stringified so heterogeneous column
    types stack in one frame; ``mean`` is NULL for non-numeric columns.
    Exact distinct counts by default (the profile is a correctness gate);
    ``approx=True`` switches to HLL ``approx_count_distinct`` — no expand
    for multiple DISTINCTs, one cheap pass for interactive 100 TB
    profiling."""
    cols = cols or df.columns
    numeric = {f.name for f in df.schema.fields
               if isinstance(f.dataType, NumericType)}
    distinct_of = (F.approx_count_distinct if approx else F.count_distinct)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(f"`{c}`").isNull(), 1).otherwise(0))
                .alias(f"{c}__null"),
            distinct_of(F.col(f"`{c}`")).alias(f"{c}__dist"),
            F.min(F.col(f"`{c}`")).cast("string").alias(f"{c}__min"),
            F.max(F.col(f"`{c}`")).cast("string").alias(f"{c}__max"),
            (F.round(F.avg(F.col(f"`{c}`").cast("double")), 6) if c in numeric
             else F.lit(None).cast("double")).alias(f"{c}__mean"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"`{c}__n`").alias("n"),
            F.col(f"`{c}__null`").cast("long").alias("n_null"),
            F.col(f"`{c}__dist`").alias("n_distinct"),
            F.col(f"`{c}__min`").alias("min_str"),
            F.col(f"`{c}__max`").alias("max_str"),
            F.col(f"`{c}__mean`").alias("mean"),
        ) for c in cols])
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def validate(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate named SQL boolean expectations (each must hold for every
    row) in ONE pass: ``(rule, n_rows, n_violations, ok)``. A NULL
    predicate result counts as a violation (unknown is not proof)."""
    if not rules:
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(F.sum(
            F.when(F.coalesce(F.expr(cond), F.lit(False)), 0).otherwise(1)
        ).cast("long").alias(f"{name}__v"))
    row = df.agg(*aggs)
    per_rule = F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"`{name}__v`").alias("n_violations"),
            (F.col(f"`{name}__v`") == 0).cast("int").alias("ok"),
        ) for name in rules])
    return row.select(F.explode(per_rule).alias("r")).select("r.*")


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE aggregation
    pass (all covariances/stddevs in a single ``agg``): rows
    ``(col_a, col_b, corr)`` for a < b. ``try_divide`` yields NULL for
    zero-variance columns instead of ANSI divide-by-zero."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
            # pair-masked moments (corr semantics): each side NULL where
            # its partner is NULL, so stddevs cover exactly the paired rows
            va = F.when(cb.isNotNull(), ca)
            vb = F.when(ca.isNotNull(), cb)
            aggs.append(F.round(F.try_divide(
                F.covar_samp(va, vb),
                F.stddev_samp(va) * F.stddev_samp(vb)), 6).alias(f"{a}__{b}"))
    row = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col(f"`{a}__{b}`").alias("corr"))
        for i, a in enumerate(cols) for b in cols[i + 1:]])
    return row.select(F.explode(pairs).alias("p")).select("p.*")


def fk_violations(fact: DataFrame, dim: DataFrame, fact_key: str,
                  dim_key: str, broadcast_dim: bool = True) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` has no match in ``dim`` —
    referential-integrity check as a left-anti join (broadcast by default:
    dimension key sets are small next to facts)."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    return fact.join(keys, fact_key, "left_anti")


_DEC = "decimal(38,12)"


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (nats) of each named column's value distribution
    — the profiling statistic behind skew alarms ("this partition key
    has 0.3 nats — everything is one value") and feature audits. NULLs
    count as a category. One grouped count per column.

    Determinism contract: each group's ``n·ln n`` term is cast to
    DECIMAL(38,12) BEFORE summing, so the reduction is exact and
    partition-order independent (float entropy sums differ in low bits
    per merge order); one double conversion at the end. Uses the
    windowless identity ``H = ln N − (Σ n·ln n)/N`` — the per-value
    count frame (unbounded for high-cardinality columns) is reduced in
    ONE grouped aggregate, never pushed through a global total window.
    Output: ``(col, n_distinct, entropy)``."""
    outs = []
    for c in cols:
        counts = (df.groupBy(F.col(c).cast("string").alias("__v"))
                  .agg(F.count(F.lit(1)).alias("__n")))
        term = (F.col("__n").cast("double")
                * F.log(F.col("__n").cast("double"))).cast(_DEC)
        h = (F.log(F.col("__t").cast("double"))
             - F.col("__s").cast("double") / F.col("__t").cast("double"))
        outs.append(counts
                    .agg(F.count(F.lit(1)).alias("n_distinct"),
                         F.sum("__n").alias("__t"),
                         F.sum(term).alias("__s"))
                    .select(F.lit(c).alias("col"), "n_distinct",
                            (F.round(h, 6) + F.lit(0.0))
                            .alias("entropy")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def gini_coefficient(df: DataFrame, group_col: str) -> DataFrame:
    """Gini coefficient of the row-count distribution across groups —
    0 = perfectly balanced corpus, ->1 = one group owns everything; the
    single-number imbalance alarm for source mix / shard balance.
    Computed by the sorted-rank identity
    ``G = 2·Σ(rank·n_g) / (n·Σn_g) − (n+1)/n`` with ranks ascending by
    (count, group): all-integer products summed in DECIMAL (exact,
    order-independent), one double expression at the end. The rank is
    the bucketed two-phase ``row_number``
    (:func:`~otit_swt_spark.pipelines.analytics.two_phase_row_number`)
    over the per-group count frame — no single-partition WindowExec,
    so group_col may be an unbounded key (users), not just a handful
    of sources."""
    from otit_swt_spark.pipelines.analytics import two_phase_row_number

    counts = (df.groupBy(F.col(group_col).alias("g"))
              .agg(F.count(F.lit(1)).alias("n")))
    b = counts.agg(F.min("n").alias("lo"), F.max("n").alias("hi")).first()
    if b["lo"] is None:
        return counts.agg(F.count(F.lit(1)).alias("n_groups"),
                          F.sum("n").cast("long").alias("n_rows"),
                          F.lit(None).cast("double").alias("gini")) \
            .limit(0)
    ranked = two_phase_row_number(counts, "n", "g", "__rk",
                                  b["lo"], b["hi"])
    agg = (ranked
           .agg(F.count(F.lit(1)).alias("k"),
                F.sum(F.col("n").cast(_DEC)).alias("s"),
                F.sum((F.col("__rk") * F.col("n")).cast(_DEC))
                .alias("rs")))
    k = F.col("k").cast("double")
    g = (F.lit(2.0) * F.col("rs").cast("double")
         / (k * F.col("s").cast("double"))
         - (k + F.lit(1.0)) / k)
    return agg.select(F.col("k").alias("n_groups"),
                      F.col("s").cast("long").alias("n_rows"),
                      (F.round(g, 6) + F.lit(0.0)).alias("gini"))


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """k-anonymity risk audit over a quasi-identifier combination: rows
    whose quasi-identifier equivalence class has fewer than ``k``
    members are re-identifiable; the report returns one row per
    AT-RISK class with its size — empty result == the release satisfies
    k-anonymity. One grouped count; no row-level data leaves the
    cluster. Pairs with the Laplace release in
    ``analytics.dp_noisy_counts`` (suppress-then-noise is the standard
    pipeline)."""
    cls = (df.groupBy(*[F.col(c) for c in quasi_cols])
           .agg(F.count(F.lit(1)).alias("class_size")))
    return cls.where(F.col("class_size") < k)


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column —
    the classic fabricated-data / unit-mixing alarm for financial and
    metering columns (naturally-grown magnitudes follow
    ``p(d) = log10(1 + 1/d)``; uniform or hand-entered values don't).
    The leading digit is taken from the integer part's string head
    (never ``log10`` — float log of exact powers of ten can land a
    hair below the integer and misassign the digit). Values < 1 or
    NULL are excluded (no stable first digit). Output: one row per
    digit 1-9 with observed count/frequency, the Benford expectation,
    and the deviation; the only window runs over the <=9-row digit
    frame."""
    from pyspark.sql import Window as W

    d = (df.select(F.col(col).cast("double").alias("v"))
         .where(F.col("v") >= 1)
         .select(F.substring(F.floor("v").cast("long").cast("string"),
                             1, 1).cast("int").alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(W.partitionBy())
    freq = F.col("n") / F.col("__t").cast("double")
    expect = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (d.withColumn("__t", tot)
            .select("digit", "n",
                    (F.round(freq, 6) + F.lit(0.0)).alias("observed"),
                    (F.round(expect, 6) + F.lit(0.0)).alias("benford"),
                    (F.round(freq - expect, 6) + F.lit(0.0))
                    .alias("deviation"))
            .orderBy("digit"))


def theil_index(df: DataFrame, group_col: str) -> DataFrame:
    """Theil T inequality index of the row-count distribution across
    groups — gini's information-theoretic sibling (0 = balanced,
    ln(k) = one group owns everything), with the property gini lacks:
    it DECOMPOSES additively across sub-populations, so per-shard
    Theils + a between-shard term reconstruct the corpus number.
    Computed by the windowless identity
    ``T = (Σ n·ln n)/S − ln(S/k)`` (S = Σn, k = #groups): ONE grouped
    count and ONE aggregate — no rank, no window, no second pass; the
    cheapest imbalance alarm in the module. Terms are DECIMAL-cast
    before summing (order-independent), one double expression at the
    end. Output: ``(n_groups, n_rows, theil)``."""
    counts = (df.groupBy(F.col(group_col).alias("g"))
              .agg(F.count(F.lit(1)).alias("n")))
    term = (F.col("n").cast("double")
            * F.log(F.col("n").cast("double"))).cast(_DEC)
    agg = counts.agg(F.count(F.lit(1)).alias("k"),
                     F.sum("n").alias("s"),
                     F.sum(term).alias("t"))
    theil = (F.col("t").cast("double") / F.col("s").cast("double")
             - F.log(F.col("s").cast("double")
                     / F.col("k").cast("double")))
    return agg.select(F.col("k").cast("long").alias("n_groups"),
                      F.col("s").cast("long").alias("n_rows"),
                      (F.round(theil, 6) + F.lit(0.0)).alias("theil"))
