"""Z-order layout keys vs a python Morton reference."""

import pytest

from pyradiomics_spark.operators.layout import (
    zorder_key, zorder_repartition)


def _ref_bucket(x, edges):
    return sum(1 for e in edges if x > e)


def _ref_z(buckets, bits):
    z = 0
    n = len(buckets)
    for ci, bk in enumerate(buckets):
        for b in range(bits):
            z += ((bk >> b) & 1) << (b * n + ci)
    return z


def test_zorder_key_matches_reference(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    xs = rng.uniform(0, 100, 64)
    ys = rng.uniform(-50, 50, 64)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        ["id", "x", "y"])
    bits = 3
    out = {r.id: r.zorder for r in zorder_key(
        df, ["x", "y"], bits=bits, round_dp=None).collect()}

    n_levels = 2 ** bits
    ex = np.quantile(xs, [k / n_levels for k in range(1, n_levels)],
                     method="linear")
    ey = np.quantile(ys, [k / n_levels for k in range(1, n_levels)],
                     method="linear")
    for i, (x, y) in enumerate(zip(xs, ys)):
        want = _ref_z([_ref_bucket(x, ex), _ref_bucket(y, ey)], bits)
        assert out[i] == want, i

    # locality sanity: rows in the same (x,y) quadrant share high bits
    lohi = sorted(out.values())
    assert lohi[0] >= 0 and lohi[-1] < 2 ** (bits * 2)


def test_zorder_repartition_plan_and_order(spark):
    df = spark.range(0, 1000).selectExpr(
        "id", "id % 37 AS x", "(id * 7) % 101 AS y")
    out = zorder_repartition(df, ["x", "y"], bits=3, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Sort" in plan
    # z values non-decreasing within each partition
    import pandas as pd

    pdf = out.select(
        F_spid(), "zorder").toPandas()
    for _, g in pdf.groupby("pid"):
        zs = g["zorder"].tolist()
        assert zs == sorted(zs)

    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, ["x"], bits=0)


def F_spid():
    from pyspark.sql import functions as F

    return F.spark_partition_id().alias("pid")


def test_minmax_index_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from pyradiomics_spark.operators.layout import minmax_index

    rng = np.random.default_rng(4)
    pdf = pd.DataFrame({
        "b": rng.integers(0, 4, 200),
        "x": rng.normal(0, 1, 200),
        "y": rng.integers(-50, 50, 200).astype("int64"),
    })
    pdf.loc[pdf.index % 7 == 0, "x"] = None
    df = spark.createDataFrame(pdf)
    out = minmax_index(df, "b", ["x", "y"]).toPandas()
    assert set(out["column"]) == {"x", "y"}
    for b, g in pdf.groupby("b"):
        rx = out[(out.bucket == b) & (out.column == "x")].iloc[0]
        assert float(rx.min_v) == g.x.min()
        assert float(rx.max_v) == g.x.max()
        assert rx.n_rows == len(g) and rx.n_nulls == g.x.isna().sum()
        ry = out[(out.bucket == b) & (out.column == "y")].iloc[0]
        assert int(ry.min_v) == g.y.min() and int(ry.max_v) == g.y.max()
        assert ry.n_nulls == 0


def test_minmax_index_single_shuffle(spark):
    from pyradiomics_spark.operators.layout import minmax_index

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet")
    plan = minmax_index(
        ev, "event_type",
        ["ts", "value", "user_id"])._jdf.queryExecution(
        ).executedPlan().toString()
    # the long form must reuse ONE aggregate, not re-scan per column
    assert plan.count("Exchange hashpartitioning") <= 1 or \
        plan.count("ReusedExchange") >= 2
