"""Scale-hardened centroid/plane scoring: the broadcast-numpy Arrow arm
must agree with the literal-expression arm (same cells, buckets, top-k)
and keep the logical plan O(1) in k·dim — a production quantizer
(k=256+, dim=768) as literals would be a ~10⁶-node expression tree."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from pyradiomics_spark.operators.clustering import assign_cells, kmeans_step
from pyradiomics_spark.operators.similarity import (
    EXPR_MAX_TERMS, hyperplane_buckets, ivf_topk, _planes)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _vec_df(spark, X, id0=0):
    rows = [(id0 + i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assign_cells_arms_agree(spark, rng):
    X = rng.normal(size=(60, 16))
    cents = rng.normal(size=(6, 16))
    df = _vec_df(spark, X)
    by_id = lambda d: {r.vec_id: r.cell for r in d.collect()}
    e = by_id(assign_cells(df, cents, method="expr"))
    a = by_id(assign_cells(df, cents, method="arrow"))
    assert e == a
    # and both match the straight numpy argmin
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want = dict(enumerate(np.argmin(d2, axis=1).tolist()))
    assert e == want


def test_hyperplane_arms_agree(spark, rng):
    X = rng.normal(size=(50, 24))
    df = _vec_df(spark, X)
    e = {r.vec_id: r.bucket for r in hyperplane_buckets(
        df, "vec_id", "embedding", 10, 24, method="expr").collect()}
    a = {r.vec_id: r.bucket for r in hyperplane_buckets(
        df, "vec_id", "embedding", 10, 24, method="arrow").collect()}
    assert e == a


def test_ivf_topk_arms_agree(spark, rng):
    dim = 16
    C = rng.normal(size=(100, dim))
    Q = C[[3, 40, 77]] + rng.normal(scale=0.05, size=(3, dim))
    corpus = _vec_df(spark, C)
    queries = spark.createDataFrame(
        [(i, [float(v) for v in q]) for i, q in enumerate(Q)],
        "query_id long, embedding array<double>")
    kw = dict(k=3, n_cells=8, nprobe=3, dim=dim)
    key = lambda d: sorted(map(tuple, d.select(
        "query_id", "vec_id", "rank").collect()))
    assert key(ivf_topk(corpus, queries, method="expr", **kw)) \
        == key(ivf_topk(corpus, queries, method="arrow", **kw))


def test_auto_dispatch_boundary(spark, rng):
    df = _vec_df(spark, rng.normal(size=(4, 8)))
    small = assign_cells(df, np.zeros((4, 8)))          # 32 terms → expr
    big = assign_cells(df, np.zeros((EXPR_MAX_TERMS // 8 + 1, 8)))
    assert "mapinpandas" not in small._jdf.queryExecution().toString().lower()
    assert "mapinpandas" in big._jdf.queryExecution().toString().lower()


def test_production_quantizer_scale(spark, rng):
    """k=256 × dim=768 (≈200k literals if done as expressions): the arrow
    arm must produce numpy-exact assignments with a BOUNDED plan."""
    k, dim, n = 256, 768, 300
    X = rng.normal(size=(n, dim))
    cents = _planes(k, dim, seed="scale-test")
    df = _vec_df(spark, X)
    assigned = assign_cells(df, cents)  # auto → arrow at this k·dim
    plan = assigned._jdf.queryExecution().toString()
    assert len(plan) < 20_000, f"plan not bounded: {len(plan)} chars"
    got = {r.vec_id: r.cell for r in assigned.collect()}
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want = dict(enumerate(np.argmin(d2, axis=1).tolist()))
    assert got == want


def test_kmeans_step_at_scale_matches_numpy(spark, rng):
    k, dim, n = 256, 768, 400
    X = rng.normal(size=(n, dim))
    cents = _planes(k, dim, seed="scale-km")
    df = _vec_df(spark, X)
    new, counts = kmeans_step(df, cents)  # auto → arrow assignment
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    cells = np.argmin(d2, axis=1)
    want = cents.copy()
    for c in np.unique(cells):
        want[c] = X[cells == c].mean(axis=0)
    assert np.allclose(new, want, atol=1e-9)
    assert counts == {int(c): int((cells == c).sum()) for c in np.unique(cells)}


def test_ivf_trained_quantizer_at_scale(spark, rng):
    """ivf_topk with a trained k=64 × dim=768 quantizer (49k terms → arrow)
    returns sane neighbors for a self-query."""
    dim = 768
    C = rng.normal(size=(120, dim))
    corpus = _vec_df(spark, C)
    queries = spark.createDataFrame(
        [(0, [float(v) for v in C[11]])],
        "query_id long, embedding array<double>")
    cents = _planes(64, dim, seed="scale-ivf")
    out = ivf_topk(corpus, queries, k=1, centroids=cents, nprobe=4)
    rows = out.collect()
    assert rows and rows[0].vec_id == 11 and rows[0].cosine > 0.999


def test_null_embeddings_yield_null_not_garbage(spark):
    """Null embedding → null cell/bucket in BOTH arms. Unguarded, the
    expression arm folds null vectors into an arbitrary-but-plausible cell
    (all-null distance structs still sort) — a silent wrong answer at
    production scale."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, None), (2, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.eye(2, 4)
    for method in ("expr", "arrow"):
        got = {r.vec_id: r.cell
               for r in assign_cells(df, cents, method=method).collect()}
        assert got == {0: 0, 1: None, 2: 1}, method
        b = {r.vec_id: r.bucket for r in hyperplane_buckets(
            df, "vec_id", "embedding", 4, 4, method=method).collect()}
        assert b[1] is None and b[0] is not None and b[2] is not None, method


def test_null_embedding_rows_drop_from_ivf(spark, rng):
    dim = 8
    C = rng.normal(size=(20, dim))
    rows = [(i, [float(v) for v in C[i]]) for i in range(20)] + [(99, None)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [float(v) for v in C[5]])], "query_id long, embedding array<double>")
    for method in ("expr", "arrow"):
        out = ivf_topk(corpus, queries, k=3, n_cells=4, nprobe=2, dim=dim,
                       method=method).collect()
        assert out and all(r.vec_id != 99 for r in out), method


def test_ragged_embedding_fails_loudly_on_arrow_arm(spark):
    """A schema-drifted shard (wrong vector width) must raise a clear
    error, not score garbage through a misaligned gemm."""
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="width mismatch"):
        assign_cells(bad, np.eye(2, 4), method="arrow").collect()


def test_assign_cells_near_tie_cancellation(spark):
    """Adversarial near-tie at large vector norm: the gemm expansion
    ||x||^2 - 2xc + ||c||^2 carries ~||x||^2*eps absolute error (>> the
    true distance gap here); the exact top-2 refine must keep the Arrow
    arm in agreement with the full-precision expression arm."""
    dim = 4
    x = np.full(dim, 1024.0)
    c_near = x.copy()
    c_near[0] += 2.0 ** -10                 # true d^2 = 2^-20
    c_far = x.copy()
    c_far[0] += 2.0 ** -10 + 2.0 ** -40     # true d^2 = 2^-20 + ~1.8e-15
    cents = np.stack([c_far, c_near])       # nearest is cell 1
    df = _vec_df(spark, np.tile(x, (8, 1)))
    for method in ("expr", "arrow"):
        got = {r.vec_id: r.cell
               for r in assign_cells(df, cents, method=method).collect()}
        assert set(got.values()) == {1}, (method, got)


def test_nan_component_parity_across_arms(spark):
    """A NaN embedding COMPONENT must bucket/assign identically in both
    arms: Spark orders NaN as the largest double (NaN > 0 is true, NaN
    sorts first descending), numpy's default is the opposite — the Arrow
    arms compensate explicitly."""
    rows = [(0, [float("nan"), 1.0, -1.0, 2.0]),
            (1, [1.0, 2.0, 3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.eye(3, 4)
    res = {}
    for method in ("expr", "arrow"):
        res[method] = (
            {r.vec_id: r.cell
             for r in assign_cells(df, cents, method=method).collect()},
            {r.vec_id: r.bucket for r in hyperplane_buckets(
                df, "vec_id", "embedding", 5, 4, method=method).collect()},
        )
    assert res["expr"] == res["arrow"], res


def test_inf_component_parity_across_arms(spark):
    """A ±inf COMPONENT must assign identically in both arms (ADVICE r4):
    the expr arm sees all-inf distances and ties to cell 0, but on the
    Arrow arm inf−inf yields MIXED inf/NaN distances, so an argpartition
    over d2 could pick an arbitrary cell; the guard must trigger on any
    non-finite row, not just NaN in d2[:, 0]."""
    rows = [(0, [float("inf"), 1.0, -1.0, 2.0]),
            (1, [-float("inf"), 0.5, 0.5, 0.5]),
            (2, [1.0, 2.0, 3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.eye(3, 4) * 2.0
    res = {}
    for method in ("expr", "arrow"):
        res[method] = {r.vec_id: r.cell
                       for r in assign_cells(df, cents, method=method).collect()}
    assert res["expr"] == res["arrow"], res
    assert res["arrow"][0] == 0 and res["arrow"][1] == 0


def test_null_element_inside_vector_nulls_both_arms(spark):
    """A null ELEMENT inside a non-null embedding is schema drift
    (ADVICE r4). Arrow→pandas silently converts it to NaN, so unguarded
    the Arrow arm would set a plane bit / tie to cell 0 while the expr
    arm's null arithmetic yields a null dot — a cross-arm divergence
    auto-dispatch could flip on. Both arms must fold it into the
    established null-embedding → null-output contract."""
    bad = spark.createDataFrame(
        [(0, [1.0, None, 3.0, 4.0]), (1, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>")
    for method in ("expr", "arrow"):
        got = {r.vec_id: r.cell
               for r in assign_cells(bad, np.eye(2, 4),
                                     method=method).collect()}
        assert got[0] is None and got[1] is not None, (method, got)
        b = {r.vec_id: r.bucket for r in hyperplane_buckets(
            bad, "vec_id", "embedding", 4, 4, method=method).collect()}
        assert b[0] is None and b[1] is not None, (method, b)
