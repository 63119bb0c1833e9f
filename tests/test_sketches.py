"""Count-min sketch (operators/sketches.py): one-sided error guarantee,
exactness below saturation, mergeability, and determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyradiomics_spark.operators.sketches import cms_estimate, cms_sketch


@pytest.fixture(scope="module")
def zipf_tokens(spark):
    rng = np.random.default_rng(11)
    toks = [f"tok{z}" for z in rng.zipf(1.5, 3000) if z < 500]
    return spark.createDataFrame([(t,) for t in toks], ["tok"]), toks


def test_estimate_never_undercounts(spark, zipf_tokens):
    df, toks = zipf_tokens
    sk = cms_sketch(df, "tok", width=64, depth=4)  # narrow → collisions
    items = df.select("tok").distinct()
    est = {r.tok: r.cms_count
           for r in cms_estimate(sk, items, "tok", width=64,
                                 depth=4).collect()}
    from collections import Counter
    true = Counter(toks)
    assert all(est[t] >= n for t, n in true.items())
    # ...and within the CMS bound with room to spare for most items
    n_tot = len(toks)
    tight = sum(1 for t, n in true.items() if est[t] <= n + n_tot // 8)
    assert tight > len(true) * 0.9


def test_exact_when_unsaturated(spark):
    df = spark.createDataFrame(
        [(f"v{i % 5}",) for i in range(100)], ["tok"])
    sk = cms_sketch(df, "tok", width=4096, depth=4)
    est = {r.tok: r.cms_count
           for r in cms_estimate(sk, df.distinct(), "tok", width=4096,
                                 depth=4).collect()}
    assert est == {f"v{i}": 20 for i in range(5)}


def test_unseen_item_estimates_zero_on_empty_cells(spark):
    df = spark.createDataFrame([("a",)], ["tok"])
    sk = cms_sketch(df, "tok", width=4096, depth=4)
    items = spark.createDataFrame([("zzz-never-seen",)], ["tok"])
    est = cms_estimate(sk, items, "tok", width=4096, depth=4).first()
    assert est.cms_count == 0


def test_merge_equals_single_build(spark, zipf_tokens):
    df, _ = zipf_tokens
    half1 = df.limit(1000)
    half2 = df.exceptAll(half1)
    merged = (
        cms_sketch(half1, "tok", width=64, depth=4)
        .unionByName(cms_sketch(half2, "tok", width=64, depth=4))
        .groupBy("d", "cell").agg(F.sum("cnt").alias("cnt"))
    )
    single = cms_sketch(df, "tok", width=64, depth=4)
    a = {(r.d, r.cell): r.cnt for r in merged.collect()}
    b = {(r.d, r.cell): r.cnt for r in single.collect()}
    assert a == b


def test_sketch_size_bounded_and_validated(spark, zipf_tokens):
    df, _ = zipf_tokens
    sk = cms_sketch(df, "tok", width=32, depth=3)
    assert sk.count() <= 32 * 3
    with pytest.raises(ValueError, match=">= 1"):
        cms_sketch(df, "tok", width=0)


def _py_hll(values, p=10, seed=0):
    """Pure-python register twin."""
    import hashlib
    regs = {}
    sb = 60 - p
    for v in values:
        h = int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)
        b, w = h >> sb, h & ((1 << sb) - 1)
        rho = sb + 1 if w == 0 else sb + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_python_twin(spark):
    from pyradiomics_spark.operators.sketches import hll_registers

    vals = [f"url{i}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], ["u"])
    got = {r.bucket: r.rho
           for r in hll_registers(df, "u", p=8, seed=3).collect()}
    assert got == _py_hll(vals, p=8, seed=3)


def test_hll_estimate_accuracy(spark):
    from pyradiomics_spark.operators.sketches import (hll_estimate,
                                                      hll_registers)

    # duplicates must not move the estimate: distinct semantics
    vals = [f"item{i % 5000}" for i in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], ["u"])
    regs = hll_registers(df, "u", p=10)
    est, nonzero = hll_estimate(regs, p=10)
    # HLL rel error ~ 1.04/sqrt(1024) ≈ 3.3%; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.10
    assert nonzero <= 1024


def test_hll_merge_and_small_range(spark):
    from pyspark.sql import functions as F

    from pyradiomics_spark.operators.sketches import (hll_estimate,
                                                      hll_registers)

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["u"])
    b = spark.createDataFrame([(f"a{i}",) for i in range(150, 450)], ["u"])
    merged = (
        hll_registers(a, "u").unionByName(hll_registers(b, "u"))
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    single = hll_registers(a.unionByName(b), "u")
    assert ({(r.bucket, r.rho) for r in merged.collect()}
            == {(r.bucket, r.rho) for r in single.collect()})
    est, _ = hll_estimate(single, p=10)
    # 450 distinct « 2.5·1024: linear-counting regime, tight accuracy
    assert abs(est - 450) / 450 < 0.05
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(a, "u", p=2)


def test_bloom_no_false_negatives(spark):
    from pyradiomics_spark.operators.sketches import (bloom_build,
                                                      bloom_contains)

    members = [f"doc{i}" for i in range(1000)]
    df = spark.createDataFrame([(m,) for m in members], ["u"])
    bloom = bloom_build(df, "u", n_bits=1 << 14, n_hashes=4)
    got = {r.u: r.maybe_member
           for r in bloom_contains(bloom, df, "u", n_bits=1 << 14,
                                   n_hashes=4).collect()}
    assert all(got[m] for m in members)  # NEVER a false negative


def test_bloom_false_positive_rate_in_design_band(spark):
    from pyradiomics_spark.operators.sketches import (bloom_build,
                                                      bloom_contains)

    members = spark.createDataFrame(
        [(f"in{i}",) for i in range(1000)], ["u"])
    probes = spark.createDataFrame(
        [(f"out{i}",) for i in range(2000)], ["u"])
    bloom = bloom_build(members, "u", n_bits=1 << 14, n_hashes=4)
    fp = (bloom_contains(bloom, probes, "u", n_bits=1 << 14, n_hashes=4)
          .where("maybe_member").count())
    # theoretical fpr ≈ (1-e^(-kn/m))^k ≈ 0.24% at n=1000,m=16384,k=4;
    # allow a generous band
    assert fp / 2000 < 0.02


def test_bloom_merge_and_duplicate_items(spark):
    from pyradiomics_spark.operators.sketches import (bloom_build,
                                                      bloom_contains)

    a = spark.createDataFrame([("x",), ("y",)], ["u"])
    b = spark.createDataFrame([("z",)], ["u"])
    merged = bloom_build(a, "u").unionByName(bloom_build(b, "u")).distinct()
    single = bloom_build(a.unionByName(b), "u")
    assert ({r.bit for r in merged.collect()}
            == {r.bit for r in single.collect()})
    # duplicated probe rows answer once, correctly
    probes = spark.createDataFrame([("x",), ("x",), ("nope",)], ["u"])
    got = {r.u: r.maybe_member
           for r in bloom_contains(single, probes, "u").collect()}
    assert got["x"] is True and got["nope"] is False
    with pytest.raises(ValueError, match="n_bits"):
        bloom_build(a, "u", n_bits=1)


def test_hll_by_group_matches_driver_estimate(spark):
    """The fully-distributed per-group estimate must equal the pinned
    driver-side hll_estimate finalize on each group's slice, and sit
    within HLL's expected error of the exact count."""
    from pyradiomics_spark.operators.sketches import (
        hll_by_group, hll_estimate, hll_registers)

    rows = [("a", f"v{i}") for i in range(2000)] \
        + [("b", f"v{i % 37}") for i in range(500)] \
        + [("c", None)]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {r.g: (r.est, r.nonzero_buckets)
           for r in hll_by_group(df, "g", "x", p=10).collect()}
    assert set(got) == {"a", "b"}  # null-only group contributes nothing

    for g, exact in (("a", 2000), ("b", 37)):
        est_drv, nz_drv = hll_estimate(
            hll_registers(df.where(f"g = '{g}'"), "x", p=10), p=10)
        assert got[g][1] == nz_drv
        assert got[g][0] == pytest.approx(est_drv, rel=1e-9)
        assert abs(got[g][0] - exact) / exact < 0.15


def _py_kmv(values, k, seed=0):
    import hashlib

    hs = sorted({int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15],
                     16) for v in values})
    return hs[:k]


def test_kmv_sketch_matches_python_twin(spark):
    from pyradiomics_spark.operators.sketches import kmv_sketch

    vals = [f"tok{i % 700}" for i in range(3000)]  # duplicates collapse
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "u"])
    rows = kmv_sketch(df, "g", "u", k=32, seed=5).collect()
    got = [r.h for r in sorted(rows, key=lambda r: r.pos)]
    assert got == _py_kmv(vals, 32, seed=5)
    assert [r.pos for r in sorted(rows, key=lambda r: r.pos)] == list(
        range(1, 33))


def test_kmv_estimate_exact_below_k(spark):
    from pyradiomics_spark.operators.sketches import (kmv_estimate,
                                                      kmv_sketch)

    df = spark.createDataFrame(
        [("a", f"v{i % 10}") for i in range(100)]
        + [("b", f"w{i}") for i in range(500)], ["g", "u"])
    sk = kmv_sketch(df, "g", "u", k=64)
    out = {r.g: (r.n_hashes, r.est) for r in
           kmv_estimate(sk, "g", k=64).collect()}
    # group a has 10 < k distinct values -> exact
    assert out["a"] == (10, 10.0)
    # group b: unbiased estimate within 25% at k=64, n=500
    n, est = out["b"]
    assert n == 64 and abs(est - 500) / 500 < 0.25


def test_kmv_estimate_matches_python_formula(spark):
    from pyradiomics_spark.operators.sketches import (kmv_estimate,
                                                      kmv_sketch)

    vals = [f"u{i}" for i in range(2000)]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "u"])
    k = 128
    est = kmv_estimate(kmv_sketch(df, "g", "u", k=k), "g", k=k
                       ).collect()[0].est
    hs = _py_kmv(vals, k)
    assert est == pytest.approx((k - 1) / (hs[k - 1] / float(1 << 60)),
                                rel=1e-12)


def test_kmv_merge_equals_sketch_of_union(spark):
    from pyradiomics_spark.operators.sketches import kmv_merge, kmv_sketch

    a_vals = [(f"g{i % 2}", f"x{i}") for i in range(400)]
    b_vals = [(f"g{i % 2}", f"x{i + 200}") for i in range(400)]  # overlap
    a = spark.createDataFrame(a_vals, ["g", "u"])
    b = spark.createDataFrame(b_vals, ["g", "u"])
    k = 48
    merged = kmv_merge(kmv_sketch(a, "g", "u", k=k),
                       kmv_sketch(b, "g", "u", k=k), "g", k=k)
    direct = kmv_sketch(a.unionByName(b), "g", "u", k=k)
    got = {(r.g, r.pos): r.h for r in merged.collect()}
    want = {(r.g, r.pos): r.h for r in direct.collect()}
    assert got == want


def test_kmv_rejects_tiny_k(spark):
    from pyradiomics_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame([("g", "v")], ["g", "u"])
    with pytest.raises(ValueError):
        kmv_sketch(df, "g", "u", k=1)


def test_kmv_jaccard_exact_below_k(spark):
    import pytest

    from pyradiomics_spark.operators.sketches import (kmv_jaccard,
                                                      kmv_sketch)

    # |A|=30, |B|=30, |A∩B|=10, |A∪B|=50 < k -> estimate is EXACT 0.2
    a_vals = [("g", f"v{i}") for i in range(30)]
    b_vals = [("g", f"v{i}") for i in range(20, 50)]
    a = spark.createDataFrame(a_vals, ["g", "u"])
    b = spark.createDataFrame(b_vals, ["g", "u"])
    k = 64
    row = kmv_jaccard(kmv_sketch(a, "g", "u", k=k),
                      kmv_sketch(b, "g", "u", k=k), "g", k=k).collect()[0]
    assert row.k_used == 50
    assert row.j_est == pytest.approx(10 / 50)


def test_kmv_jaccard_estimates_overlap(spark):
    import pytest

    from pyradiomics_spark.operators.sketches import (kmv_jaccard,
                                                      kmv_sketch)

    # true J = 1000/3000 = 1/3; k=256 -> SE ~ sqrt(J(1-J)/k) ~ 0.03
    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(2000)], ["g", "u"])
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(1000, 3000)], ["g", "u"])
    k = 256
    row = kmv_jaccard(kmv_sketch(a, "g", "u", k=k),
                      kmv_sketch(b, "g", "u", k=k), "g", k=k).collect()[0]
    assert row.k_used == 256
    assert row.j_est == pytest.approx(1 / 3, abs=0.1)


def test_kmv_jaccard_disjoint_and_identical(spark):
    from pyradiomics_spark.operators.sketches import (kmv_jaccard,
                                                      kmv_sketch)

    a = spark.createDataFrame([("g", f"a{i}") for i in range(100)],
                              ["g", "u"])
    b = spark.createDataFrame([("g", f"b{i}") for i in range(100)],
                              ["g", "u"])
    k = 32
    sa, sb = kmv_sketch(a, "g", "u", k=k), kmv_sketch(b, "g", "u", k=k)
    assert kmv_jaccard(sa, sb, "g", k=k).collect()[0].j_est == 0.0
    assert kmv_jaccard(sa, sa, "g", k=k).collect()[0].j_est == 1.0
