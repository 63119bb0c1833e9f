"""Binned interval join vs a brute-force cross-product reference."""

import pytest

from pyradiomics_spark.operators.intervals import interval_join


FACTS = [(i, float(t)) for i, t in enumerate(
    [0, 5, 10, 99, 100, 101, 150, 250, 300, 999])]
INTERVALS = [  # (iv_id, lo, hi) half-open
    (0, 0.0, 100.0),
    (1, 90.0, 110.0),      # overlaps 0
    (2, 100.0, 100.0),     # empty
    (3, 240.0, 310.0),     # spans bins
    (4, 990.0, 2000.0),    # long
]


def _brute(closed_facts, ivs):
    return sorted(
        (f, iv) for f, t in closed_facts for iv, lo, hi in ivs
        if lo <= t < hi)


@pytest.fixture(scope="module")
def dfs(spark):
    f = spark.createDataFrame(FACTS, ["fact_id", "ts"])
    iv = spark.createDataFrame(INTERVALS, ["iv_id", "lo", "hi"])
    return f, iv


@pytest.mark.parametrize("width", [7.0, 50.0, 1000.0])
def test_matches_brute_force_any_bucket_width(spark, dfs, width):
    f, iv = dfs
    got = sorted(
        (r.fact_id, r.iv_id)
        for r in interval_join(f, iv, "ts", "lo", "hi", width).collect())
    assert got == _brute(FACTS, INTERVALS)


def test_left_outer_keeps_unmatched(spark, dfs):
    f, iv = dfs
    out = interval_join(f, iv, "ts", "lo", "hi", 50.0, how="left_outer")
    rows = out.collect()
    matched = _brute(FACTS, INTERVALS)
    # ts=150 matches nothing -> survives with null iv_id
    nulls = sorted(r.fact_id for r in rows if r.iv_id is None)
    assert nulls == [6]
    assert len(rows) == len(matched) + len(nulls)


def test_by_keys_restrict_matches(spark):
    f = spark.createDataFrame(
        [(0, "u1", 5.0), (1, "u2", 5.0)], ["fact_id", "user", "ts"])
    iv = spark.createDataFrame(
        [(10, "u1", 0.0, 10.0)], ["iv_id", "user", "lo", "hi"])
    got = interval_join(f, iv, "ts", "lo", "hi", 4.0, by=("user",)).collect()
    assert [(r.fact_id, r.iv_id) for r in got] == [(0, 10)]


def test_no_duplicate_matches_across_bins(spark, dfs):
    f, iv = dfs
    out = interval_join(f, iv, "ts", "lo", "hi", 7.0)
    pairs = [(r.fact_id, r.iv_id) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_guards(spark, dfs):
    f, iv = dfs
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(f, iv, "ts", "lo", "hi", 0.0)
    with pytest.raises(ValueError, match="how"):
        interval_join(f, iv, "ts", "lo", "hi", 1.0, how="full")
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(f.withColumnRenamed("fact_id", "iv_id"),
                      iv, "ts", "lo", "hi", 1.0)
    # over-quantized interval fails fast instead of exploding
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="too many bins"):
        interval_join(f, iv, "ts", "lo", "hi", 0.01,
                      max_bins_per_interval=10).collect()


def test_timestamp_typed_columns(spark):
    f = spark.sql(
        "SELECT 1 AS fact_id, timestamp'2024-01-01 00:05:00' AS ts")
    iv = spark.sql(
        "SELECT 7 AS iv_id, timestamp'2024-01-01 00:00:00' AS lo, "
        "timestamp'2024-01-01 01:00:00' AS hi")
    got = interval_join(f, iv, "ts", "lo", "hi", 600.0).collect()
    assert [(r.fact_id, r.iv_id) for r in got] == [(1, 7)]


def test_fuzz_against_brute_force(spark):
    """Seeded random fuzz: 300 facts x 60 intervals (empty, point-width,
    long, overlapping, negative-epoch) across awkward bucket widths must
    match the O(n*m) reference exactly."""
    import numpy as np

    rng = np.random.default_rng(42)
    ts = rng.uniform(-500, 1500, size=300)
    facts = [(i, float(t)) for i, t in enumerate(ts)]
    lo = rng.uniform(-600, 1400, size=60)
    length = rng.choice([0.0, 0.5, 3.0, 40.0, 400.0], size=60)
    ivs = [(j, float(a), float(a + w)) for j, (a, w) in
           enumerate(zip(lo, length))]
    want = _brute(facts, ivs)

    f = spark.createDataFrame(facts, ["fact_id", "ts"])
    iv = spark.createDataFrame(ivs, ["iv_id", "lo", "hi"])
    for width in (1.0, 13.7, 100.0, 5000.0):
        got = sorted(
            (r.fact_id, r.iv_id)
            for r in interval_join(f, iv, "ts", "lo", "hi", width).collect())
        assert got == want, f"width={width}"
