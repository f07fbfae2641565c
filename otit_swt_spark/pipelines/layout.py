"""Z-order (Morton-curve) data layout for multi-column data skipping.

Sorting a table by one column gives parquet row-group min/max pruning on
that column only; interleaving the bits of several columns' bucket codes
produces a space-filling-curve key whose sort order clusters rows that are
close in EVERY dimension — so min/max statistics prune scans for filters
on any of the z-ordered columns (the Delta Lake / ClickHouse `ORDER BY`
trick, built from plain expressions).

Everything is arithmetic on longs (whole-stage codegen): bucketize each
column to ``bits`` bits via linear min/max scaling (one tiny agg pass for
the bounds), interleave with shift/mask terms, then
``repartitionByRange`` + ``sortWithinPartitions`` on the key. Linear
bucketing keeps the key cross-engine reproducible (the correctness oracle
recomputes it in SQL); for heavily skewed columns substitute quantile
boundaries from ``approxQuantile`` — the interleave is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column linearly onto ``[0, 2^bits)`` (clamped)."""
    n = 1 << bits
    scaled = F.floor((col.cast("double") - F.lit(float(lo)))
                     / F.lit(max(float(hi) - float(lo), 1e-300)) * F.lit(n))
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(n - 1).cast("long"),
                              scaled.cast("long")))


def interleave(codes: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of code i lands at position
    ``b * len(codes) + i``. With k columns at ``bits`` bits each the key
    spans ``k * bits`` bits — keep ``k * bits <= 62``."""
    k = len(codes)
    if k * bits > 62:
        raise ValueError(f"{k} columns x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(codes):
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)),
                b * k + i)
    return z


def zorder_key(df: DataFrame, cols: list[str], bits: int = 10,
               bounds: dict[str, tuple[float, float]] | None = None,
               out_col: str = "zkey") -> DataFrame:
    """``df`` plus the Morton key over ``cols``. ``bounds`` pins each
    column's (min, max) for reproducible keys; omitted bounds are computed
    with one tiny aggregate pass."""
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.agg(*[f for c in missing
                       for f in (F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                                 F.max(F.col(c).cast("double")).alias(f"{c}__hi"))
                       ]).collect()[0]
        for c in missing:
            bounds[c] = (row[f"{c}__lo"], row[f"{c}__hi"])
    codes = [bucketize(F.col(c), *bounds[c], bits) for c in cols]
    return df.withColumn(out_col, interleave(codes, bits))


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 8, bits: int = 10,
                   bounds: dict[str, tuple[float, float]] | None = None,
                   ) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the z-key: each file covers a compact hyper-rectangle of the
    z-ordered columns, so min/max footer stats skip files for filters on
    ANY of them. One range shuffle (sampled boundaries), no global sort."""
    keyed = zorder_key(df, cols, bits, bounds)
    (keyed.repartitionByRange(n_files, "zkey")
     .sortWithinPartitions("zkey")
     .drop("zkey")
     .write.mode("overwrite").parquet(path))
