"""Incremental aggregate maintenance: keep a grouped-aggregate table
up to date from change batches WITHOUT rescanning the fact table — the
materialized-view maintenance primitive for 100 TB stores, built from the
same partition-pruned copy-on-write machinery as pipelines.merge.

The maintained state holds only DECOMPOSABLE partials per group —
``n`` (count) and one ``sum_<col>`` per measure — from which count, sum,
and mean are exact. A delta batch (optionally carrying a ±1 ``weight``
column for CDC retractions) is partially aggregated map-side, combined
with the stored partials for ONLY the groups it touches, and written back
with dynamic partition overwrite: a one-partition delta against a
million-partition aggregate reads and rewrites one partition.

min/max are NOT maintainable under retraction without the full history —
callers needing them recompute affected groups from the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otit_swt_spark import fsutil

_DEC = "decimal(38,6)"


def partial_agg(df: DataFrame, keys: list[str], sum_cols: list[str],
                weight_col: str | None = None) -> DataFrame:
    """Decomposable partials per group: ``n`` plus exact decimal
    ``sum_<col>`` for each measure. ``weight_col`` (+1 insert / -1
    retract) turns the same pass into a CDC delta aggregate."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    aggs = [F.sum(w).alias("n")]
    for c in sum_cols:
        aggs.append(F.sum((F.col(c).cast(_DEC) * w).cast(_DEC))
                    .cast(_DEC).alias(f"sum_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def combine_partials(stored: DataFrame, delta: DataFrame,
                     keys: list[str]) -> DataFrame:
    """Merge two partial-aggregate frames by group: counts and sums add;
    groups whose count reaches zero disappear (full retraction)."""
    merged = stored.unionByName(delta, allowMissingColumns=False)
    sums = [F.sum("n").alias("n")] + [
        F.sum(c).cast(_DEC).alias(c)
        for c in stored.columns if c.startswith("sum_")]
    return (merged.groupBy(*keys).agg(*sums)
            .filter(F.col("n") != 0))


def incremental_agg_upsert(spark: SparkSession, path: str, delta: DataFrame,
                           keys: list[str], sum_cols: list[str],
                           partition_col: str | None = None,
                           weight_col: str | None = None) -> None:
    """Fold a raw delta batch into the aggregate table at ``path``
    (creating it on first call). With ``partition_col`` (which must be one
    of ``keys``): only the stored partitions the delta touches are read
    (PartitionFilters) and dynamically overwritten — untouched partitions'
    files are never opened. Partitions whose every group fully retracts
    are deleted explicitly."""
    if partition_col is not None and partition_col not in keys:
        raise ValueError("partition_col must be one of the group keys")
    d = partial_agg(delta, keys, sum_cols, weight_col)
    if not fsutil.exists(spark, path):
        writer = d.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(path)
        return
    stored = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__incr_tmp__"
    if partition_col is None:
        combined = combine_partials(stored, d, keys)
        combined.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
        fsutil.delete(spark, tmp)
        return
    parts = [r[0] for r in d.select(partition_col).distinct().collect()]
    touched = stored.filter(F.col(partition_col).isin(parts))
    combined = combine_partials(touched, d, keys)
    combined.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        staged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # compare partition values AS STRINGS: reading a partitioned dataset
    # re-infers the partition column's type (e.g. '2024-01-03' comes back
    # as a date), so a raw set test against the delta's python values
    # would mark every just-written partition as "emptied" and delete it
    surviving = {str(r[0])
                 for r in staged.select(partition_col).distinct().collect()}
    for v in (p for p in parts if str(p) not in surviving):
        fsutil.delete(spark, f"{path.rstrip('/')}/{partition_col}={v}")
    fsutil.delete(spark, tmp)


def read_agg(spark: SparkSession, path: str, sum_cols: list[str]) -> DataFrame:
    """The maintained aggregate with derived means: ``n``, exact
    ``sum_<col>`` (as double) and ``avg_<col>`` per measure."""
    df = spark.read.parquet(path)
    out = [c for c in df.columns if not c.startswith("sum_")]
    cols = [F.col(c) for c in out]
    for c in sum_cols:
        cols.append(F.col(f"sum_{c}").cast("double").alias(f"sum_{c}"))
        cols.append(F.round(F.col(f"sum_{c}").cast("double") / F.col("n"), 6)
                    .alias(f"avg_{c}"))
    return df.select(*cols)
