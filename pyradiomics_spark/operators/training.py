"""In-engine model-training steps for data-curation classifiers.

The fastText-style quality/domain classifier of CCNet/DSIR pipelines is
a linear model; one synchronous full-batch gradient step is a pure
aggregation, so it belongs in the engine next to ``kmeans_step``
(operators/clustering.py): features and per-row gradient contributions
are scan-fused column expressions, and ONE map-side-combined aggregate
returns k+2 numbers to the driver — no Python on the hot path, no
shuffle wider than the final single-row agg, identical plan at 10^12
rows.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: logit clamp — keeps exp() finite in IEEE doubles in every engine
_Z_CLIP = 30.0


def logreg_grad_step(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights,
    lr: float = 0.1,
    l2: float = 0.0,
):
    """One full-batch gradient-descent step of L2-regularized logistic
    regression: ``weights`` is ``[bias, w_1 … w_k]`` aligned with
    ``feature_cols``; returns ``(new_weights: list, mean_loss: float,
    n_rows: int)``.

    Per row: ``z = clip(b + Σ w_i x_i, ±30)``, ``p = 1/(1+e^{-z})``,
    gradient contribution ``(p − y)`` for the bias and ``(p − y)·x_i``
    per feature, log-loss ``−[y ln p + (1−y) ln(1−p)]``. The driver
    update is ``w ← w − lr·(∇/n + l2·w)`` (bias unregularized).

    Scale shape: one projection + ONE agg with k+2 sums — partial
    aggregation makes the shuffle k+2 doubles per partition; the model
    itself (k+1 doubles) rides into the plan as literals, so there is
    no join and nothing to broadcast. Iterating = calling this in a
    driver loop, exactly like Lloyd's ``kmeans_step``."""
    w = [float(v) for v in np.asarray(weights, dtype=float)]
    if len(w) != len(feature_cols) + 1:
        raise ValueError(
            f"weights has {len(w)} entries, need {len(feature_cols) + 1} "
            "(bias first)")
    z = F.lit(w[0])
    for wi, c in zip(w[1:], feature_cols):
        z = z + F.lit(wi) * F.col(c)
    z = F.greatest(F.lit(-_Z_CLIP), F.least(F.lit(_Z_CLIP), z))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    y = F.col(label_col).cast("double")
    resid = p - y
    aggs = [F.sum(resid).alias("g0")]
    aggs += [
        F.sum(resid * F.col(c)).alias(f"g{i + 1}")
        for i, c in enumerate(feature_cols)
    ]
    aggs += [
        F.sum(-(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))
              ).alias("loss_sum"),
        F.count("*").alias("n"),
    ]
    row = df.agg(*aggs).collect()[0]
    n = int(row["n"])
    if n == 0:
        raise ValueError("empty input")
    new_w = []
    for i, wi in enumerate(w):
        g = float(row[f"g{i}"]) / n
        reg = 0.0 if i == 0 else l2 * wi
        new_w.append(wi - lr * (g + reg))
    return new_w, float(row["loss_sum"]) / n, n


def sigmoid(x: float) -> float:
    """Driver-side twin of the row expression (clipped like it)."""
    x = max(-_Z_CLIP, min(_Z_CLIP, x))
    return 1.0 / (1.0 + math.exp(-x))


def logreg_predict(
    df: DataFrame,
    feature_cols: list[str],
    weights,
    out_col: str = "score",
) -> DataFrame:
    """Inference twin of ``logreg_grad_step``: append the model's
    probability ``sigmoid(clip(b + Σ w_i·x_i, ±30))`` as ``out_col`` —
    the scoring pass a trained quality classifier runs over the full
    corpus (CCNet keeps documents by thresholding / sampling on exactly
    this score). Scan-fused column expressions only: the model rides in
    as literals, so scoring 10^12 rows is a projection — no join, no
    shuffle, no Python."""
    w = [float(v) for v in np.asarray(weights, dtype=float)]
    if len(w) != len(feature_cols) + 1:
        raise ValueError(
            f"weights has {len(w)} entries, need {len(feature_cols) + 1} "
            "(bias first)")
    z = F.lit(w[0])
    for wi, c in zip(w[1:], feature_cols):
        z = z + F.lit(wi) * F.col(c)
    z = F.greatest(F.lit(-_Z_CLIP), F.least(F.lit(_Z_CLIP), z))
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table for a probabilistic classifier:
    (bin, n, mean_score, label_rate) over ``n_bins`` equal-width score
    buckets — the standard calibration readout (a well-calibrated
    quality classifier has label_rate ≈ mean_score per bin; systematic
    gaps mean the keep-threshold is biased). ONE map-side-combined
    groupBy on the arithmetic bucket id; scores exactly 1.0 clamp into
    the top bin."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    b = F.least(F.floor(F.col(score_col) * n_bins).cast("long"),
                F.lit(n_bins - 1))
    return (df.groupBy(b.alias("bin"))
            .agg(F.count("*").alias("n"),
                 (F.sum(score_col) / F.count("*")).alias("mean_score"),
                 (F.sum(F.col(label_col).cast("double")) / F.count("*"))
                 .alias("label_rate")))


def auc_eval(
    df: DataFrame,
    score_col: str,
    label_col,
    group_cols=None,
) -> DataFrame:
    """ROC AUC of classifier scores against a binary label via the
    Mann–Whitney rank identity (Hanley & McNeil 1982):

        AUC = ( Σ_{positives} avg_rank − n⁺(n⁺+1)/2 ) / (n⁺ · n⁻)

    with AVERAGE ranks for tied scores (the tie-correct form — min- or
    row-ranks bias AUC whenever a quantized score ties across classes).
    Output ``(group..., n_pos, n_neg, auc)``; NULL when a class is
    absent. This completes the classifier-eval family: calibration_bins
    answers 'are the probabilities honest', AUC answers 'does the score
    order the classes at all'.

    avg_rank is computed WITHOUT a second pass: ``rank()`` (min-rank)
    plus the tie-group size from one count window over the same score
    partitioning, ``avg = rank + (ties − 1)/2``.

    Scale note: a global ranking is inherent to AUC, so the ungrouped
    form sorts the full input — run it on the EVALUATION SET (bounded
    by construction), not the corpus; per-group AUC (``group_cols``)
    partitions the sort exactly like every other grouped window here."""
    from pyspark.sql import Window

    groups = ([group_cols] if isinstance(group_cols, str)
              else list(group_cols or []))
    y = (F.col(label_col) if isinstance(label_col, str)
         else label_col).cast("int")
    s = F.col(score_col).cast("double")
    wr = Window.partitionBy(*groups).orderBy(s)
    wt = Window.partitionBy(*groups, s)
    avg_rank = (F.rank().over(wr).cast("double")
                + (F.count("*").over(wt).cast("double") - 1.0) / 2.0)
    per = df.select(*groups, y.alias("__y"), avg_rank.alias("__r"))
    agg = per.groupBy(*groups).agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("__sr"))
    npos = F.col("n_pos").cast("double")
    nneg = F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("__sr") - npos * (npos + 1.0) / 2.0) / (npos * nneg))
    return agg.select(*groups, "n_pos", "n_neg", auc.alias("auc"))
