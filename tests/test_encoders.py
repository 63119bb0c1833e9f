"""Target encoding / PSI drift vs hand-computed references."""

import math

import pytest

from pyradiomics_spark.functions.encoders import psi_drift, target_encode


def test_target_encode_smoothing(spark):
    rows = [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 1.0), ("c", 0.0)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    gm = 3.0 / 5.0
    out = {(r.cat, r.y): r.cat_enc for r in target_encode(
        df, "cat", "y", smoothing=2.0).collect()}
    assert out[("a", 1.0)] == pytest.approx((2.0 + 2.0 * gm) / (3 + 2))
    assert out[("b", 1.0)] == pytest.approx((1.0 + 2.0 * gm) / (1 + 2))
    # smoothing=0 degenerates to the raw category mean
    raw = {r.cat: r.cat_enc for r in target_encode(
        df, "cat", "y", smoothing=0.0).collect()}
    assert raw["a"] == pytest.approx(2.0 / 3.0)


def test_target_encode_leave_one_out(spark):
    rows = [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 1.0)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    gm = 3.0 / 4.0
    got = [(r.cat, r.y, r.cat_enc) for r in target_encode(
        df, "cat", "y", smoothing=1.0, leave_one_out=True).collect()]
    for cat, y, enc in got:
        if cat == "a":
            want = ((2.0 - y) + 1.0 * gm) / (2 + 1)
        else:  # singleton: n-1 = 0 -> pure smoothed prior
            want = (0.0 + 1.0 * gm) / (0 + 1)
        assert enc == pytest.approx(want), (cat, y)


def test_psi_identical_is_zero_and_shift_detected(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    same = {r.bin: r.term for r in psi_drift(a, a, "x").collect()}
    assert same[-1] == pytest.approx(0.0, abs=1e-12)
    # shifted snapshot -> positive PSI
    b = spark.createDataFrame([(float(i) + 40,) for i in range(100)],
                              ["x"])
    drift = {r.bin: r for r in psi_drift(a, b, "x").collect()}
    assert drift[-1].term > 0.25
    # per-bin shares sum to 1 on both sides
    pa = sum(r.p_a for bin_, r in drift.items() if bin_ >= 0)
    pb = sum(r.p_b for bin_, r in drift.items() if bin_ >= 0)
    assert pa == pytest.approx(1.0) and pb == pytest.approx(1.0)


def test_guards(spark):
    df = spark.createDataFrame([("a", 1.0)], ["cat", "y"])
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, "cat", "y", smoothing=-1.0)


def _py_feature_hash(rows, n_features, seed=0):
    import hashlib
    from collections import defaultdict

    out = defaultdict(int)
    for rid, text in rows:
        for tok in text.split(" "):
            if not tok:
                continue
            h = hashlib.md5(f"{tok}:{seed}".encode()).hexdigest()
            idx = int(h[:8], 16) % n_features
            sign = 1 if (int(h[8], 16) & 1) == 1 else -1
            out[(rid, idx)] += sign
    return dict(out)


def test_feature_hash_matches_python(spark):
    from pyradiomics_spark.functions.encoders import feature_hash

    rows = [(1, "the cat sat on the mat"),
            (2, "spark shuffles the  data"),   # double space -> empty tok
            (3, "")]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {(r.id, r.feat_idx): r.feat_val
           for r in feature_hash(df, "id", "text", n_features=16,
                                 seed=2).collect()}
    assert got == _py_feature_hash(rows, 16, seed=2)


def test_feature_hash_signed_collisions_cancel(spark):
    """Same token twice doubles its cell; the sign is deterministic per
    token so repeated text scales values linearly."""
    from pyradiomics_spark.functions.encoders import feature_hash

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b a b")], ["id", "text"])
    out = feature_hash(df, "id", "text", n_features=8)
    one = {r.feat_idx: r.feat_val for r in
           out.where("id = 1").collect()}
    two = {r.feat_idx: r.feat_val for r in
           out.where("id = 2").collect()}
    assert two == {k: 2 * v for k, v in one.items()}


def test_feature_hash_rejects_width(spark):
    import pytest

    from pyradiomics_spark.functions.encoders import feature_hash

    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    with pytest.raises(ValueError):
        feature_hash(df, "id", "text", n_features=1)


def _py_woe(pairs, alpha):
    import math
    from collections import Counter

    n = Counter(c for c, _ in pairs)
    npos = Counter(c for c, y in pairs if y == 1)
    cats = sorted(n)
    c_cnt = len(cats)
    tot_p = sum(npos.values())
    tot_n = sum(n.values()) - tot_p
    woe, iv = {}, 0.0
    for c in cats:
        p1 = (npos.get(c, 0) + alpha) / (tot_p + alpha * c_cnt)
        p0 = (n[c] - npos.get(c, 0) + alpha) / (tot_n + alpha * c_cnt)
        woe[c] = math.log(p1 / p0)
        iv += (p1 - p0) * woe[c]
    return woe, iv


def test_woe_matches_python(spark):
    import pytest

    from pyradiomics_spark.functions.encoders import woe_encode

    pairs = ([("a", 1)] * 30 + [("a", 0)] * 10
             + [("b", 1)] * 5 + [("b", 0)] * 45
             + [("c", 1)] * 2)           # single-class category
    df = spark.createDataFrame(pairs, ["cat", "y"])
    rows = woe_encode(df, "cat", "y", alpha=0.5).collect()
    want_woe, want_iv = _py_woe(pairs, 0.5)
    assert {r.cat for r in rows} == set(want_woe)
    for r in rows:
        assert r.woe == pytest.approx(want_woe[r.cat], rel=1e-12)
        assert r.iv == pytest.approx(want_iv, rel=1e-12)
        assert r.n_pos <= r.n
    # separating column -> substantial IV
    assert rows[0].iv > 0.5


def test_woe_rejects_zero_alpha(spark):
    import pytest

    from pyradiomics_spark.functions.encoders import woe_encode

    df = spark.createDataFrame([("a", 1)], ["cat", "y"])
    with pytest.raises(ValueError):
        woe_encode(df, "cat", "y", alpha=0.0)


def _py_dist_distance(xs, ys):
    support = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    d_ks = 0.0
    w1 = 0.0
    ca = cb = 0
    for i, v in enumerate(support):
        ca += sum(1 for x in xs if x == v)
        cb += sum(1 for y in ys if y == v)
        d = abs(ca / na - cb / nb)
        d_ks = max(d_ks, d)
        if i + 1 < len(support):
            w1 += d * (support[i + 1] - v)
    return d_ks, w1


def test_distribution_distance_matches_python(spark):
    import pytest

    from pyradiomics_spark.functions.encoders import distribution_distance

    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0]
    ys = [2.0, 3.0, 3.0, 4.0, 9.0]
    a = spark.createDataFrame([(x,) for x in xs], ["v"])
    b = spark.createDataFrame([(y,) for y in ys], ["v"])
    row = distribution_distance(a, b, "v").collect()[0]
    d_ks, w1 = _py_dist_distance(xs, ys)
    assert (row.n_a, row.n_b) == (6, 5)
    assert row.d_ks == pytest.approx(d_ks, rel=1e-12)
    assert row.w1 == pytest.approx(w1, rel=1e-12)


def test_distribution_distance_identical_and_shifted(spark):
    import pytest

    from pyradiomics_spark.functions.encoders import distribution_distance

    xs = [float(i) for i in range(50)]
    a = spark.createDataFrame([(x,) for x in xs], ["v"])
    same = distribution_distance(a, a, "v").collect()[0]
    assert same.d_ks == 0.0 and same.w1 == 0.0
    # constant shift by c: W1 = c exactly, KS -> large
    b = spark.createDataFrame([(x + 10.0,) for x in xs], ["v"])
    shifted = distribution_distance(a, b, "v").collect()[0]
    assert shifted.w1 == pytest.approx(10.0, rel=1e-12)
    assert shifted.d_ks == pytest.approx(10.0 / 50.0, rel=1e-12)
