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

# k·dim (literal nodes) above which centroid/plane scoring switches from
# the builtin-expression arm to the broadcast-numpy Arrow arm. The
# expression arm embeds every centroid coordinate as F.lit — at curation
# scale (k=1024+, dim=768) that is a ~10⁶-node expression tree: Catalyst
# analysis blowup and the 64KB JVM codegen method limit long before data
# volume matters. The analog of the reference's C-boundary dispatch
# (/root/reference/radiomics/base.py:181-198): small problems stay in the
# engine's native expression layer, large ones cross to the vectorized
# kernel.
EXPR_MAX_TERMS = 8192


def _matmul_scores(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) dot-product scores via one BLAS gemm; rows with non-finite
    entries propagate NaN (the expression arm does the same)."""
    return X @ C.T


def _stack_vecs(col, dim: int) -> tuple:
    """(X float64 (n_valid, dim), valid bool mask) from a pandas column of
    embedding lists. Null embeddings are masked out (→ null output, same
    contract as the guarded expression arms); a ragged or wrong-width
    vector raises a clear error instead of a cryptic BLAS/object-dtype one
    (at 100 TB a schema-drifted shard should fail loudly, not score
    garbage)."""
    vals = col.tolist()
    valid = np.array([v is not None for v in vals], dtype=bool)
    rows = [v for v, m in zip(vals, valid) if m]
    if not rows:
        return np.empty((0, dim)), valid
    widths = {len(v) for v in rows}
    if widths != {dim}:
        raise ValueError(
            f"embedding width mismatch: expected {dim}, batch has "
            f"{sorted(widths)}")
    return np.asarray(rows, dtype=np.float64), valid


def _nullify_partial(df: DataFrame, vec_col: str) -> DataFrame:
    """Normalize a partially-null embedding (null ELEMENTS inside a
    non-null list) to a null embedding BEFORE arm dispatch. Arrow→pandas
    silently converts null list elements to NaN, so on the arrow arm a
    null element would set a plane bit / tie to cell 0 while the expr
    arm's null arithmetic yields a null dot — a cross-arm divergence
    auto-dispatch could flip on. Folding both into the established
    "null embedding → null output" contract keeps the arms identical and
    keeps a schema-drifted shard from scoring garbage at 100 TB. Pure
    codegen expression (one exists() scan per row), no shuffle."""
    c = F.col(vec_col)
    return df.withColumn(
        vec_col,
        F.when(F.exists(c, lambda e: e.isNull()),
               F.lit(None).cast(df.schema[vec_col].dataType)).otherwise(c))


def _masked_int_col(values, valid: np.ndarray, dtype: str = "Int32"):
    """Nullable integer pandas column: next value for each valid row, NA
    for masked (null-embedding) rows."""
    import pandas as pd

    it = iter(values)
    return pd.array([int(next(it)) if m else None for m in valid],
                    dtype=dtype)


def _topn_desc(scores: np.ndarray, n: int) -> np.ndarray:
    """Per-row top-n column indices by DESCENDING score, ties broken to the
    HIGHER index — bitwise the order of ``reverse(array_sort(struct(score,
    cell)))`` in the expression arm. Spark orders NaN as the LARGEST
    double (numpy sorts it last): map NaN → +inf so a NaN-scored cell
    ranks first in both arms."""
    k = scores.shape[1]
    scores = np.where(np.isnan(scores), np.inf, scores)
    rev = np.argsort(-scores[:, ::-1], axis=1, kind="stable")[:, :n]
    return (k - 1) - rev


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
    n_shards: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query. ``queries``: (query_id, vec).

    Two-level top-k (the TakeOrdered shape, SURVEY §2.6 "never a global
    sort"): a per-(query, corpus-shard) rank window bounds every sort
    partition at |corpus|/n_shards rows, then the k-bounded survivors
    (n_shards·k rows per query) are merge-ranked in a second window.
    A single per-query window would put every query's |corpus| scored
    rows into ONE task — fine at test scale, a single-partition sort at
    10⁹ docs. Any global top-k row is necessarily in its shard's top-k,
    so the output is identical. ``n_shards`` defaults to the cluster's
    slot count (scale-adaptive; the shard key is a deterministic hash
    of the corpus id, so retries reproduce the same assignment)."""
    if n_shards is None:
        n_shards = max(corpus.sparkSession.sparkContext.defaultParallelism,
                       16)
    q = F.broadcast(queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")))
    scored = corpus.crossJoin(q).withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("__qvec"))
    ).withColumn(
        "__bfs", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    order = (F.desc("cosine"), F.col(id_col))
    w_shard = Window.partitionBy(query_id_col, "__bfs").orderBy(*order)
    w_query = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("__srk", F.row_number().over(w_shard))
        .where(F.col("__srk") <= k)
        .withColumn("rank", F.row_number().over(w_query))
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


def _nearest_cells_arrow(
    df: DataFrame,
    cents_normalized: np.ndarray,
    vec_col: str,
    n: int,
    out_col: str,
) -> DataFrame:
    """Broadcast-numpy top-n nearest centroids by cosine (centroids
    pre-normalized, so dot-product rank ≡ cosine rank per row). Appends
    ``out_col``: int when n == 1, array<int> otherwise. Tie order matches
    the expression arm (descending score, then descending cell)."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(cents_normalized))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + (f", {out_col} int" if n == 1 else f", {out_col} array<int>")

    def run(batches):
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X, valid = _stack_vecs(pdf[vec_col], C.shape[1])
            top = _topn_desc(_matmul_scores(X, C), n)
            pdf = pdf.copy()
            if n == 1:
                pdf[out_col] = _masked_int_col(top[:, 0], valid)
            else:
                it = iter(list(top.astype(np.int32)))
                pdf[out_col] = [next(it) if m else None for m in valid]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: str = "pyradiomics-spark",
    method: str = "auto",
) -> DataFrame:
    """Add an LSH ``bucket`` int column = sign pattern of n fixed planes.

    Deterministic and reproducible on any executor count in BOTH arms:
    ``expr`` evaluates the plane dot products as builtin expressions over
    array literals (whole-stage codegen, right while n_planes·dim stays
    small); ``arrow`` broadcasts the plane matrix and signs a BLAS gemm
    per Arrow batch (the scale arm — plan size is O(1) in n_planes·dim).
    ``auto`` dispatches on EXPR_MAX_TERMS.
    """
    planes = _planes(n_planes, dim, seed)
    df = _nullify_partial(df, vec_col)
    if method == "auto":
        method = "expr" if n_planes * dim <= EXPR_MAX_TERMS else "arrow"
    int_t = "int" if n_planes <= 30 else "bigint"
    if method == "arrow":
        import pandas as pd

        bc = df.sparkSession.sparkContext.broadcast(
            np.ascontiguousarray(planes))
        pows = (2 ** np.arange(n_planes, dtype=np.int64))
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", bucket {int_t}"

        def run(batches):
            P = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X, valid = _stack_vecs(pdf[vec_col], dim)
                s = _matmul_scores(X, P)
                # Spark's `dot > 0` is TRUE for NaN (NaN orders greatest);
                # numpy's is False — OR the NaN mask in so a NaN component
                # buckets identically on both sides of the dispatch
                bits = (s > 0) | np.isnan(s)
                pdf = pdf.copy()
                dtype = "Int32" if n_planes <= 30 else "Int64"
                pdf["bucket"] = _masked_int_col(bits @ pows, valid, dtype)
                yield pdf

        return df.mapInPandas(run, schema=out_schema)
    bucket = F.lit(0)
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p)).otherwise(0)
    # null embedding → null bucket (unguarded, null>0 would silently fold
    # every null vec into bucket 0 — a wrong-but-plausible answer)
    return df.withColumn(
        "bucket",
        F.when(F.col(vec_col).isNull(), F.lit(None).cast(int_t))
        .otherwise(bucket))


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
    centroids: np.ndarray | None = None,
    method: str = "auto",
) -> DataFrame:
    """IVF-style ANN: fixed pseudo-random centroids (deterministic, or a
    trained quantizer via ``centroids`` — e.g. clustering.kmeans_fit),
    corpus rows assigned to nearest cell, queries probe their nprobe
    nearest cells. Approximate; recall rises with nprobe. Scale path: the
    per-cell join replaces the full cross product.

    Coarse quantization dispatches like assign_cells: the expression arm
    embeds centroids as literals (fine while n_cells·dim is small), the
    ``arrow`` arm broadcasts the centroid matrix and ranks one gemm per
    Arrow batch — production quantizers (n_cells=1024+, dim=768) would
    otherwise build a ~10⁶-node plan. The bucket-refine cosine below is
    per-PAIR (no literals) and stays JVM in both arms.
    """
    if centroids is None:
        cents = _planes(n_cells, dim, seed="ivf-centroids")
    else:
        cents = np.asarray(centroids, dtype=float)
        n_cells, dim = cents.shape
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    corpus = _nullify_partial(corpus, vec_col)
    queries = _nullify_partial(queries, vec_col)
    if method == "auto":
        method = "expr" if n_cells * dim <= EXPR_MAX_TERMS else "arrow"

    if method == "arrow":
        corpus_cells = _nearest_cells_arrow(corpus, cents, vec_col, 1, "cell")
        query_cells = (
            _nearest_cells_arrow(queries, cents, vec_col, nprobe, "__cells")
            .select(query_id_col, F.col(vec_col).alias("__qvec"),
                    F.explode("__cells").alias("cell")))
    else:
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

        # null embedding → null cell (drops out of the cell equi-join);
        # explode of a null probe array likewise drops the query row
        corpus_cells = corpus.withColumn(
            "cell",
            F.when(F.col(vec_col).isNull(), F.lit(None).cast("int"))
            .otherwise(nearest_cells(F.col(vec_col), 1)[0])
        )
        query_cells = queries.withColumn(
            "cell",
            F.explode(F.when(F.col(vec_col).isNull(),
                             F.lit(None).cast("array<int>"))
                      .otherwise(nearest_cells(F.col(vec_col), nprobe)))
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


def embedding_quality(
    df: DataFrame,
    vec_col: str,
    group_cols=None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-column QA census — per group: row count, null vectors,
    wrong-width vectors (when ``dim`` is given), vectors containing a
    null element, exact-zero vectors, and the L2-norm min/mean/max over
    the clean rows. The data-card row to run BEFORE ANN/semdedup jobs:
    a schema-drifted shard (wrong width), a failed encoder batch (zero
    or null vectors), or a norm collapse all surface here instead of as
    silently-garbage similarity scores downstream (the fail-loud
    contract `_stack_vecs` enforces per batch, lifted to a corpus
    census).

    Scale shape: pure per-row array expressions (fold for the norm,
    exists for the null scan — no explode, no Python) + ONE map-side-
    combined groupBy; output is |groups| rows."""
    groups = ([group_cols] if isinstance(group_cols, str)
              else list(group_cols or []))
    v = F.col(vec_col)
    is_null = v.isNull()
    has_null_el = F.when(~is_null, F.exists(v, lambda x: x.isNull())
                         ).otherwise(F.lit(False))
    wrong_width = (F.when(~is_null, F.size(v) != dim)
                   .otherwise(F.lit(False))
                   if dim is not None else F.lit(False))
    clean = ~is_null & ~has_null_el & ~wrong_width
    norm2 = F.aggregate(v, F.lit(0.0),
                        lambda a, x: a + x.cast("double") * x)
    norm = F.when(clean, F.sqrt(norm2))
    is_zero = clean & (norm2 == 0.0)
    per = df.select(
        *groups, is_null.cast("int").alias("__nl"),
        has_null_el.cast("int").alias("__ne"),
        wrong_width.cast("int").alias("__ww"),
        is_zero.cast("int").alias("__z"), norm.alias("__n"))
    return per.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__nl").cast("long").alias("n_null"),
        F.sum("__ne").cast("long").alias("n_null_elem"),
        F.sum("__ww").cast("long").alias("n_wrong_width"),
        F.sum("__z").cast("long").alias("n_zero"),
        F.min("__n").alias("min_norm"),
        (F.sum("__n") / F.count("__n")).alias("mean_norm"),
        F.max("__n").alias("max_norm"))
