"""Skew-relief join helpers.

At 100 TB a handful of hot keys (the null-ish id, the default tenant, the
bot user) can put 100× the median load on one shuffle partition and stall
the stage on a single straggler task. AQE's skew-join splitting handles
sort-merge cases at runtime; this module provides the explicit salting
form for when the plan must be skew-proof regardless of AQE (e.g. a known
pathological key distribution), plus a hot-key detector to drive it.

Salting trades shuffle volume for balance: the build side is replicated
``salt``× (only for hot keys in the split form), so prefer
``hot_keys``-targeted salting — the cold majority joins untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def top_keys(df: DataFrame, on: str | list[str], n: int = 16,
             min_count: int | None = None) -> list:
    """The ``n`` most frequent join-key values (optionally only those above
    ``min_count`` rows) — the candidates worth salting. One aggregate pass;
    run it on a sample for a quick estimate at corpus scale."""
    keys = [on] if isinstance(on, str) else list(on)
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    if min_count is not None:
        agg = agg.filter(F.col("__n") >= min_count)
    rows = agg.orderBy(F.col("__n").desc(), *keys).limit(n).collect()
    if len(keys) == 1:
        return [r[keys[0]] for r in rows]
    return [tuple(r[k] for k in keys) for r in rows]


def salted_join(left: DataFrame, right: DataFrame, on: str | list[str],
                how: str = "inner", salt: int = 16,
                hot_keys: list | None = None) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated,
    so one hot key spreads over ``salt`` shuffle partitions.

    ``hot_keys=None`` salts every row (build side replicated ``salt``×
    in full — use only when the build side is small-ish). With
    ``hot_keys``, only rows whose key is hot are salted; the cold
    majority takes the plain join and the two halves union — the
    standard split-skew plan. Result equals the unsalted join exactly
    (the salt column never escapes). ``how`` may be ``inner`` or
    ``left`` — each left row carries exactly one salt value, so outer
    semantics on the probe side survive salting.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if salt < 2:
        raise ValueError("salt must be >= 2")
    keys = [on] if isinstance(on, str) else list(on)

    if hot_keys is not None:
        if not hot_keys:
            return left.join(right, keys, how)
        if len(keys) == 1:
            hot = F.col(keys[0]).isin(list(hot_keys))
        else:
            hot = F.struct(*[F.col(k) for k in keys]).isin(
                [F.struct(*[F.lit(v) for v in t]) for t in hot_keys])
        # NULL keys count as cold: isin(NULL) is NULL, coalesce -> false
        is_hot = F.coalesce(hot, F.lit(False))
        hot_part = salted_join(left.filter(is_hot), right.filter(is_hot),
                               keys, how, salt, hot_keys=None)
        cold_part = left.filter(~is_hot).join(right.filter(~is_hot),
                                              keys, how)
        return hot_part.unionByName(cold_part)

    # deterministic per-row salt on the probe side (content-hashed — no
    # rand(), so retried tasks salt identically and results are stable)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(salt)).cast("int")
    l_s = left.withColumn(_SALT, lsalt)
    r_s = right.crossJoin(
        F.broadcast(
            right.sparkSession.range(salt).select(
                F.col("id").cast("int").alias(_SALT))))
    out = l_s.join(r_s, keys + [_SALT], how)
    return out.drop(_SALT)


def key_skew_report(df: DataFrame, on: str, top_n: int = 20) -> DataFrame:
    """Skew diagnostics as a frame: the ``top_n`` heaviest key values with
    row counts, corpus share, and rank — what you inspect before deciding
    to salt a join (:func:`salted_join`) or clip a group. One grouped
    count, a one-row total broadcast back, then a distributed
    take-ordered; the only window runs over the top_n-row result."""
    from pyspark.sql import Window as W

    agg = df.groupBy(F.col(on).alias("key")) \
            .agg(F.count(F.lit(1)).alias("n_rows"))
    total = agg.agg(F.sum("n_rows").alias("__tot"))
    top = (agg.crossJoin(F.broadcast(total))
           .select("key", "n_rows",
                   F.round(F.col("n_rows") / F.col("__tot"), 6).alias("share"))
           .orderBy(F.desc("n_rows"), "key")
           .limit(top_n))
    w = W.orderBy(F.desc("n_rows"), "key")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
