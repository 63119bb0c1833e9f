"""Distributed Lloyd (k-means) over embedding columns — the clustering
step a training-data pipeline uses for corpus curation (topic balancing,
semantic dedup cells, IVF coarse quantizers).

Reference scope note: pyradiomics has no clustering; this belongs to the
LLM-pipeline surface next to ``operators.similarity`` (whose deterministic
md5-plane init it reuses, so a fitted quantizer slot-compatibly replaces
``ivf_topk``'s fixed centroids).

Spark design (the 100-TB shape):
* assignment is 100% JVM — per-centroid squared distances via
  ``zip_with``/``aggregate`` array expressions, argmin via a sorted
  struct-array literal (k is small; the expression tree is k wide), no
  Python UDF, no shuffle;
* the update is ONE partial-aggregated shuffle: explode to (cell, dim_idx)
  and groupBy-sum — map-side combine reduces every partition to ≤ k·dim
  rows, so shuffle volume is partitions × k × dim regardless of corpus
  size; the ≤ k·dim aggregated rows come to the driver (the one permitted
  driver materialization, same as the reference loading its cluster
  centers);
* iteration count is a fixed small constant (Lloyd converges coarsely in
  a handful of rounds for curation purposes) — each round is one job.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _sqdist(vec, cent: np.ndarray):
    carr = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid (squared-euclidean) assignment, ties to the lowest
    cell id — deterministic, pure JVM expression, no shuffle."""
    vec = _as_double(F.col(vec_col))
    arr = F.array(*[
        F.struct(_sqdist(vec, c).alias("d"), F.lit(i).alias("cell"))
        for i, c in enumerate(np.asarray(centroids, dtype=float))
    ])
    return df.withColumn(cell_col, F.array_sort(arr)[0]["cell"])


def kmeans_step(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, dict]:
    """One Lloyd update: assign → per-cell per-dim mean. Returns
    (new_centroids, counts-per-cell); empty cells keep their old centroid
    (the standard Lloyd fixup)."""
    cents = np.asarray(centroids, dtype=float)
    a = assign_cells(df, cents, vec_col)
    stats = (
        a.select("cell", F.posexplode(_as_double(F.col(vec_col)))
                 .alias("idx", "val"))
        .groupBy("cell", "idx")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .collect())  # ≤ k·dim aggregated rows
    new = cents.copy()
    counts: dict = {}
    for r in stats:
        new[r.cell][r.idx] = r.s / r.n
        counts[r.cell] = int(r.n)
    return new, counts


def cluster_purity(
    assigned: DataFrame,
    label_col: str,
    cell_col: str = "cell",
) -> DataFrame:
    """Per-cluster purity against ground-truth labels — the curation-QA
    metric for a fitted quantizer (cell → majority label fraction). Two
    partial-aggregated shuffles on (cell, label) then cell; ≤ k·|labels|
    intermediate rows regardless of corpus size."""
    by = (assigned.groupBy(cell_col, label_col)
          .agg(F.count("*").alias("n")))
    return (
        by.withColumn("__tot", F.sum("n").over(Window.partitionBy(cell_col)))
        .groupBy(cell_col)
        .agg(F.max("n").alias("n_majority"),
             F.max("__tot").alias("n_total"))
        .withColumn("purity", F.col("n_majority") / F.col("n_total"))
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: str = "kmeans-init",
) -> np.ndarray:
    """Fixed-iteration Lloyd from the deterministic md5-plane init
    (operators.similarity._planes) — reproducible without any RNG state;
    the result drops into ``ivf_topk`` as a trained coarse quantizer."""
    from pyradiomics_spark.operators.similarity import _planes

    cents = _planes(k, dim, seed=seed)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(iters):
        cents, _counts = kmeans_step(df, cents, vec_col)
    return cents
