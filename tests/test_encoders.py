"""Target encoding / PSI drift vs hand-computed references."""

import math

import pytest

from pyradiomics_spark.functions.encoders import psi_drift, target_encode


def test_target_encode_smoothing(spark):
    rows = [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 1.0), ("c", 0.0)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    gm = 3.0 / 5.0
    out = {(r.cat, r.y): r.cat_enc for r in target_encode(
        df, "cat", "y", smoothing=2.0).collect()}
    assert out[("a", 1.0)] == pytest.approx((2.0 + 2.0 * gm) / (3 + 2))
    assert out[("b", 1.0)] == pytest.approx((1.0 + 2.0 * gm) / (1 + 2))
    # smoothing=0 degenerates to the raw category mean
    raw = {r.cat: r.cat_enc for r in target_encode(
        df, "cat", "y", smoothing=0.0).collect()}
    assert raw["a"] == pytest.approx(2.0 / 3.0)


def test_target_encode_leave_one_out(spark):
    rows = [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 1.0)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    gm = 3.0 / 4.0
    got = [(r.cat, r.y, r.cat_enc) for r in target_encode(
        df, "cat", "y", smoothing=1.0, leave_one_out=True).collect()]
    for cat, y, enc in got:
        if cat == "a":
            want = ((2.0 - y) + 1.0 * gm) / (2 + 1)
        else:  # singleton: n-1 = 0 -> pure smoothed prior
            want = (0.0 + 1.0 * gm) / (0 + 1)
        assert enc == pytest.approx(want), (cat, y)


def test_psi_identical_is_zero_and_shift_detected(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    same = {r.bin: r.term for r in psi_drift(a, a, "x").collect()}
    assert same[-1] == pytest.approx(0.0, abs=1e-12)
    # shifted snapshot -> positive PSI
    b = spark.createDataFrame([(float(i) + 40,) for i in range(100)],
                              ["x"])
    drift = {r.bin: r for r in psi_drift(a, b, "x").collect()}
    assert drift[-1].term > 0.25
    # per-bin shares sum to 1 on both sides
    pa = sum(r.p_a for bin_, r in drift.items() if bin_ >= 0)
    pb = sum(r.p_b for bin_, r in drift.items() if bin_ >= 0)
    assert pa == pytest.approx(1.0) and pb == pytest.approx(1.0)


def test_guards(spark):
    df = spark.createDataFrame([("a", 1.0)], ["cat", "y"])
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, "cat", "y", smoothing=-1.0)
