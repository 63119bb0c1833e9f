"""k-means (operators.clustering) vs a numpy ground-truth Lloyd, plus the
no-UDF/no-extra-shuffle plan guarantees."""

import numpy as np
import pytest

from pyradiomics_spark.operators.clustering import (
    assign_cells, kmeans_fit, kmeans_step)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # 3 gaussian blobs in 8-d
    blobs = np.concatenate([
        rng.normal(loc=c, scale=0.3, size=(60, 8))
        for c in (-2.0, 0.0, 2.0)])
    rows = [(i, [float(x) for x in blobs[i]]) for i in range(len(blobs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, blobs


def _numpy_assign(x, cents):
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def test_assign_matches_numpy(spark, vecs):
    df, x = vecs
    cents = np.array([[-2.0] * 8, [0.0] * 8, [2.0] * 8])
    got = {r.vec_id: r.cell for r in assign_cells(df, cents).collect()}
    want = _numpy_assign(x, cents)
    assert all(got[i] == want[i] for i in range(len(x)))


def test_assign_is_shuffle_free_jvm(spark, vecs):
    df, _ = vecs
    plan = _plan(assign_cells(df, np.zeros((4, 8))))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_step_matches_numpy(spark, vecs):
    df, x = vecs
    cents = np.array([[-1.0] * 8, [0.5] * 8, [3.0] * 8])
    new, counts = kmeans_step(df, cents)
    lab = _numpy_assign(x, cents)
    for c in range(3):
        if (lab == c).any():
            assert np.allclose(new[c], x[lab == c].mean(axis=0), atol=1e-9)
            assert counts[c] == int((lab == c).sum())
        else:
            assert np.allclose(new[c], cents[c])  # empty-cell fixup


def test_kmeans_fit_recovers_blobs(spark, vecs):
    df, x = vecs
    cents = kmeans_fit(df, k=3, dim=8, iters=6)
    # every fitted centroid sits near one true blob center
    for c in cents:
        best = min(abs(c.mean() - t) for t in (-2.0, 0.0, 2.0))
        assert best < 0.15
    # and the 3 centroids cover 3 distinct blobs
    nearest = {min((-2.0, 0.0, 2.0), key=lambda t: abs(c.mean() - t))
               for c in cents}
    assert len(nearest) == 3
