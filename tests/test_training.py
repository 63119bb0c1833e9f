"""logreg_grad_step vs a numpy twin — the in-engine curation-classifier
training step (operators/training.py).

Reference anchor: the CCNet/DSIR-style linear quality classifier is the
trainable half of the curation pipeline (see operators/sampling.py
dsir_log_weights); pyradiomics itself has no trainable stage, so this is
LLM-pipeline surface, not §2 parity.
"""

import math

import numpy as np
import pytest

from pyradiomics_spark.operators.training import (_Z_CLIP, logreg_grad_step,
                                                  sigmoid)


def _np_step(X, y, w, lr, l2):
    """Independent numpy twin of one clipped full-batch GD step."""
    z = np.clip(w[0] + X @ w[1:], -_Z_CLIP, _Z_CLIP)
    p = 1.0 / (1.0 + np.exp(-z))
    resid = p - y
    g = np.concatenate([[resid.sum()], resid @ X]) / len(y)
    reg = np.concatenate([[0.0], l2 * w[1:]])
    loss = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    return w - lr * (g + reg), loss


def _make_df(spark, rng, n=400, k=3, seed_w=(0.8, -1.2, 0.5)):
    X = rng.normal(size=(n, k))
    logits = X @ np.asarray(seed_w) - 0.2
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(float)
    rows = [tuple(map(float, X[i])) + (float(y[i]),) for i in range(n)]
    cols = [f"x{j}" for j in range(k)] + ["y"]
    return spark.createDataFrame(rows, cols), X, y


def test_matches_numpy_twin(spark, rng):
    df, X, y = _make_df(spark, rng)
    w0 = np.array([0.1, 0.25, -0.5, 0.75])
    new_w, loss, n = logreg_grad_step(
        df, ["x0", "x1", "x2"], "y", w0, lr=0.3, l2=0.0)
    exp_w, exp_loss = _np_step(X, y, w0, 0.3, 0.0)
    assert n == len(y)
    np.testing.assert_allclose(new_w, exp_w, rtol=1e-12, atol=1e-12)
    assert loss == pytest.approx(exp_loss, rel=1e-12)


def test_l2_regularizes_weights_not_bias(spark, rng):
    df, X, y = _make_df(spark, rng, n=200)
    w0 = np.array([0.5, 1.0, -1.0, 2.0])
    got, _, _ = logreg_grad_step(df, ["x0", "x1", "x2"], "y", w0,
                                 lr=0.2, l2=0.1)
    exp_w, _ = _np_step(X, y, w0, 0.2, 0.1)
    np.testing.assert_allclose(got, exp_w, rtol=1e-12, atol=1e-12)
    # bias gradient must NOT carry the l2 term
    got0, _, _ = logreg_grad_step(df, ["x0", "x1", "x2"], "y", w0,
                                  lr=0.2, l2=0.0)
    assert got[0] == pytest.approx(got0[0], rel=1e-12)
    assert got[1] != pytest.approx(got0[1], rel=1e-12)


def test_driver_loop_converges(spark, rng):
    df, X, y = _make_df(spark, rng, n=300)
    df = df.cache()
    w = [0.0, 0.0, 0.0, 0.0]
    losses = []
    for _ in range(25):
        w, loss, _ = logreg_grad_step(df, ["x0", "x1", "x2"], "y", w, lr=1.0)
        losses.append(loss)
    df.unpersist()
    assert losses[-1] < losses[0] * 0.8
    # recovered signs of the generating weights (0.8, -1.2, 0.5)
    assert w[1] > 0 and w[2] < 0 and w[3] > 0
    # and the fitted model actually separates: accuracy well above chance
    p = np.array([sigmoid(w[0] + float(x @ np.asarray(w[1:]))) for x in X])
    acc = ((p > 0.5) == (y > 0.5)).mean()
    assert acc > 0.7


def test_clip_keeps_loss_finite(spark):
    # hopeless weights drive |z| >> 30 — the clamp must keep log() finite
    df = spark.createDataFrame(
        [(1e6, 0.0), (-1e6, 1.0)], ["x0", "y"])
    w, loss, n = logreg_grad_step(df, ["x0"], "y", [0.0, 50.0], lr=0.1)
    assert n == 2 and math.isfinite(loss) and all(map(math.isfinite, w))


def test_weight_length_validated(spark):
    df = spark.createDataFrame([(1.0, 0.0)], ["x0", "y"])
    with pytest.raises(ValueError, match="need 2"):
        logreg_grad_step(df, ["x0"], "y", [0.0, 1.0, 2.0])


def test_empty_input_raises(spark):
    df = spark.createDataFrame([(1.0, 0.0)], ["x0", "y"]).where("x0 > 5")
    with pytest.raises(ValueError, match="empty"):
        logreg_grad_step(df, ["x0"], "y", [0.0, 1.0])


# ---------------------------------------------------------------------------
# logreg_predict + calibration_bins
# ---------------------------------------------------------------------------

def test_logreg_predict_matches_sigmoid(spark):
    import math

    from pyradiomics_spark.operators.training import (
        logreg_predict, sigmoid)

    rows = [(float(i), float(i % 3)) for i in range(-5, 6)]
    df = spark.createDataFrame(rows, ["x1", "x2"])
    w = [0.5, -0.25, 1.5]
    got = logreg_predict(df, ["x1", "x2"], w).collect()
    for r in got:
        z = w[0] + w[1] * r.x1 + w[2] * r.x2
        assert r.score == pytest.approx(sigmoid(z), rel=1e-15)
    # clip region: huge feature saturates, never inf/nan
    big = spark.createDataFrame([(1e9, 0.0)], ["x1", "x2"])
    s = logreg_predict(big, ["x1", "x2"], [0.0, 1.0, 0.0]).collect()[0].score
    assert 0.0 < s <= 1.0


def test_logreg_predict_rejects_bad_weights(spark):
    from pyradiomics_spark.operators.training import logreg_predict

    df = spark.createDataFrame([(1.0,)], ["x1"])
    with pytest.raises(ValueError):
        logreg_predict(df, ["x1"], [0.0])


def test_calibration_bins_matches_python(spark):
    import numpy as np

    from pyradiomics_spark.operators.training import calibration_bins

    rng = np.random.default_rng(8)
    scores = rng.uniform(0, 1, 500)
    labels = (rng.uniform(0, 1, 500) < scores).astype(int)  # calibrated
    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in zip(scores, labels)],
        ["score", "y"])
    got = {r.bin: (r.n, r.mean_score, r.label_rate)
           for r in calibration_bins(df, "score", "y", n_bins=10).collect()}
    for b in range(10):
        m = (np.floor(scores * 10).clip(max=9) == b)
        if not m.any():
            continue
        n, ms, lr = got[b]
        assert n == int(m.sum())
        assert ms == pytest.approx(scores[m].mean(), rel=1e-12)
        assert lr == pytest.approx(labels[m].mean(), rel=1e-12)


def test_calibration_bins_top_bin_includes_one(spark):
    from pyradiomics_spark.operators.training import calibration_bins

    df = spark.createDataFrame([(1.0, 1), (0.95, 1)], ["score", "y"])
    out = calibration_bins(df, "score", "y", n_bins=10).collect()
    assert len(out) == 1 and out[0].bin == 9 and out[0].n == 2


def _py_auc(pairs):
    """pairs: (score, label). Tie-corrected Mann-Whitney AUC."""
    from collections import Counter

    scores = sorted(s for s, _ in pairs)
    # average rank per distinct score (1-based)
    first = {}
    cnt = Counter(scores)
    r = 1
    for s in sorted(cnt):
        first[s] = r + (cnt[s] - 1) / 2.0
        r += cnt[s]
    npos = sum(1 for _, y in pairs if y == 1)
    nneg = len(pairs) - npos
    if npos == 0 or nneg == 0:
        return None
    sr = sum(first[s] for s, y in pairs if y == 1)
    return (sr - npos * (npos + 1) / 2.0) / (npos * nneg)


def test_auc_matches_python_with_ties(spark):
    import pytest

    from pyradiomics_spark.operators.training import auc_eval

    pairs = [(0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.7, 1),
             (0.7, 0), (0.5, 1), (0.3, 0), (0.3, 0), (0.1, 0)]
    df = spark.createDataFrame(pairs, ["score", "y"])
    row = auc_eval(df, "score", "y").collect()[0]
    assert (row.n_pos, row.n_neg) == (4, 6)
    assert row.auc == pytest.approx(_py_auc(pairs), rel=1e-12)


def test_auc_perfect_random_inverted(spark):
    import pytest

    from pyradiomics_spark.operators.training import auc_eval

    perfect = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(perfect, ["score", "y"])
    assert auc_eval(df, "score", "y").collect()[0].auc == pytest.approx(1.0)
    inverted = [(float(-i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(inverted, ["score", "y"])
    assert auc_eval(df, "score", "y").collect()[0].auc == pytest.approx(0.0)
    # all-ties scores -> AUC exactly 0.5 by the tie correction
    ties = [(1.0, y) for y in (0, 1) * 5]
    df = spark.createDataFrame(ties, ["score", "y"])
    assert auc_eval(df, "score", "y").collect()[0].auc == pytest.approx(0.5)


def test_auc_single_class_null_and_groups(spark):
    from pyradiomics_spark.operators.training import auc_eval

    rows = ([("g1", float(i), 1 if i > 2 else 0) for i in range(6)]
            + [("g2", float(i), 1) for i in range(4)])
    df = spark.createDataFrame(rows, ["g", "score", "y"])
    got = {r.g: r.auc for r in auc_eval(df, "score", "y",
                                        group_cols="g").collect()}
    assert got["g1"] == 1.0 and got["g2"] is None
