"""Partition-count invariance — the repo's bit-replayability claim,
tested directly: every value-hash-gated entry must produce IDENTICAL
rows whether the shuffle fan-out is 32 or 7, because the DuckDB oracle
is in effect a 1-partition execution. Float reduction order, window
tie-breaks, and sample selection are the classic leak points; the
DECIMAL-sum / deterministic-md5 / explicit-tie-break house patterns
exist precisely so this test holds.

A representative slice (one per pattern family) keeps the runtime
bounded; the full cross-engine equivalence is already swept by the
oracle gate at three scale factors."""

import math

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# one entry per determinism-sensitive pattern family
ENTRIES = [
    "bootstrap_mean_ci",        # md5-seeded Poisson draws + order stats
    "quantile_sketch_events",   # bottom-k hash sample + order statistic
    "gini_user_events",         # DECIMAL moment sums + two-phase rank
    "seasonal_anomaly_events",  # windowed DECIMAL moments + clamp
    "ks_drift_events",          # integer argmax over bucketed cumsums
    "hll_users",                # register maxima + integer-scaled sum
    "weighted_median_lineitem",  # DECIMAL cumulative-weight threshold
    "theta_audience_overlap",   # salted two-phase min-k + pair join
    "rfm_segments",             # bucketed three-metric rank scores
    "mi_events",                # DECIMAL-summed log terms
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


@pytest.mark.parametrize("name", ENTRIES)
def test_partition_count_invariance(spark, name):
    fn = entry_mod._QUERIES[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(tuple(_norm(x) for x in r) for r in
                   fn(spark, SF_DIR).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(tuple(_norm(x) for x in r) for r in
                   fn(spark, SF_DIR).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name}: rows differ between 32 and 7 shuffle partitions"
    assert a, f"{name}: empty result"
