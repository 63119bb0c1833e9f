"""Funnel / cohort retention vs hand-computed references."""

import pytest

from pyradiomics_spark.operators.events import cohort_retention, funnel


def test_funnel_order_sensitivity(spark):
    rows = [
        # u1: view -> click -> purchase, fully ordered
        ("u1", 10.0, "view"), ("u1", 20.0, "click"),
        ("u1", 30.0, "purchase"),
        # u2: purchase BEFORE first view must not count; click after view
        ("u2", 5.0, "purchase"), ("u2", 10.0, "view"),
        ("u2", 15.0, "click"),
        # u3: click only (no view) -> stage 0
        ("u3", 7.0, "click"),
        # u4: view at same ts as click -> strict ordering drops the click
        ("u4", 9.0, "view"), ("u4", 9.0, "click"),
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "etype"])
    out = {r.user: r for r in funnel(
        df, "user", "ts", "etype",
        ("view", "click", "purchase")).collect()}
    assert out["u1"].max_stage == 3
    assert (out["u1"].ts_stage_1, out["u1"].ts_stage_2,
            out["u1"].ts_stage_3) == (10.0, 20.0, 30.0)
    assert out["u2"].max_stage == 2 and out["u2"].ts_stage_3 is None
    assert out["u3"].max_stage == 0
    assert out["u4"].max_stage == 1
    assert len(out) == 4  # every user present, even stage-0


def test_funnel_repeated_events_take_first_eligible(spark):
    rows = [("u", 1.0, "a"), ("u", 2.0, "a"), ("u", 0.5, "b"),
            ("u", 3.0, "b"), ("u", 4.0, "b")]
    df = spark.createDataFrame(rows, ["user", "ts", "etype"])
    r = funnel(df, "user", "ts", "etype", ("a", "b")).collect()[0]
    assert (r.ts_stage_1, r.ts_stage_2, r.max_stage) == (1.0, 3.0, 2)


def test_cohort_retention_matrix(spark):
    day = 86400.0
    rows = [
        ("a", 0.5 * day), ("a", 8.0 * day),    # cohort 0, offsets 0 and 1
        ("b", 1.0 * day),                       # cohort 0, offset 0 only
        ("c", 7.5 * day), ("c", 22.0 * day),   # cohort 1, offsets 0 and 2
        ("c", 7.9 * day),                       # same bucket, distinct once
    ]
    df = spark.createDataFrame(rows, ["user", "ts"])
    got = {(r.cohort, r.bucket_offset): r.n_users
           for r in cohort_retention(df, "user", "ts").collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}

    with pytest.raises(ValueError, match="bucket_days"):
        cohort_retention(df, "user", "ts", bucket_days=0)
    with pytest.raises(ValueError, match="stage"):
        funnel(df.withColumnRenamed("ts", "t"), "user", "t", "user", ())
