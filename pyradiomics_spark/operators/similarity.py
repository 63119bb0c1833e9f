"""Similarity search over embedding columns (array<float/double>).

* ``cosine_expr``        — builtin-expression cosine (zip_with + aggregate;
                           whole-stage codegen, no UDF)
* ``brute_force_topk``   — exact top-k: broadcast the (small) query set,
                           score every corpus row, window row_number per
                           query. The scan parallelizes; only the tiny
                           top-k result shuffles.
* ``hyperplane_buckets`` — deterministic random-hyperplane LSH signature
                           (sign pattern of n fixed pseudo-random planes);
                           the scale path: equality-join on bucket, refine
                           with exact cosine inside buckets.
* ``ivf_topk``           — IVF-style two-stage ANN: coarse quantize to the
                           nearest of C centroids (one broadcast score pass),
                           then search only rows in the query's nprobe
                           nearest cells.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a, b):
    """cos(a,b) as a builtin column expression over two array columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query. ``queries``: (query_id, vec)."""
    q = F.broadcast(queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")))
    scored = corpus.crossJoin(q).withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("__qvec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _planes(n_planes: int, dim: int, seed: str = "pyradiomics-spark") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: md5-expanded, engine-agnostic."""
    out = np.empty((n_planes, dim))
    for p in range(n_planes):
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()
            for off in range(0, 16, 4):
                u = int.from_bytes(h[off:off + 4], "big") / 2**32
                vals.append(2.0 * u - 1.0)
            i += 1
        out[p] = vals[:dim]
    return out


def hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: str = "pyradiomics-spark",
) -> DataFrame:
    """Add an LSH ``bucket`` int column = sign pattern of n fixed planes.

    The plane dot products are builtin expressions over array literals —
    deterministic, no UDF, reproducible on any executor count.
    """
    planes = _planes(n_planes, dim, seed)
    bucket = F.lit(0)
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p)).otherwise(0)
    return df.withColumn("bucket", bucket)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF-style ANN: fixed pseudo-random centroids (deterministic), corpus
    rows assigned to nearest cell, queries probe their nprobe nearest cells.
    Approximate; recall rises with nprobe. Scale path: the per-cell join
    replaces the full cross product."""
    cents = _planes(n_cells, dim, seed="ivf-centroids")
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    def nearest_cells(vec, n):
        scores = [
            (c, cosine_expr(vec, F.array(*[F.lit(float(x)) for x in cents[c]])))
            for c in range(n_cells)
        ]
        arr = F.array(*[
            F.struct(s.alias("score"), F.lit(c).alias("cell")) for c, s in scores
        ])
        top = F.slice(F.reverse(F.array_sort(arr)), 1, n)
        return F.transform(top, lambda s: s["cell"])

    corpus_cells = corpus.withColumn(
        "cell", nearest_cells(F.col(vec_col), 1)[0]
    )
    query_cells = queries.withColumn(
        "cell", F.explode(nearest_cells(F.col(vec_col), nprobe))
    ).select(query_id_col, F.col(vec_col).alias("__qvec"), "cell")

    scored = corpus_cells.join(F.broadcast(query_cells), "cell").withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("__qvec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
