"""Window operators: lag/lead, ffill/bfill, sessionize, rolling features,
salting, leakage audit (FIXTURES.md ts_session / ts_leak cases)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyradiomics_spark.operators.windows import (
    with_lag_lead, ffill, bfill, sessionize, session_bounds,
    rolling_firstorder, ngtdm_window, gldm_window)
from pyradiomics_spark.operators.salting import (
    with_salt, skew_stats, salted_asof_join)
from pyradiomics_spark.operators.asof import asof_join
from pyradiomics_spark.operators.leakage import audit_cut, assert_no_leakage


@pytest.fixture(scope="module")
def events(spark):
    pdf = pd.DataFrame({
        "ent": ["a"] * 5 + ["b"] * 3,
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10",  # gap 10m
            "2024-01-01 01:00",                       # gap 50m → new session
            "2024-01-01 01:05", "2024-01-01 03:00",   # gap 115m → new session
            "2024-01-01 00:00", "2024-01-01 00:29",   # 29m — inside 30m gap
            "2024-01-01 01:00",                       # 31m → new session
        ]),
        "v": [1.0, None, 3.0, None, 5.0, 10.0, None, 30.0],
    })
    return spark.createDataFrame(pdf)


def test_lag_lead(events):
    out = with_lag_lead(events, "ent", "ts", "v", offsets=(1,)).toPandas()
    a = out[out.ent == "a"].sort_values("ts")
    assert a["v_lag1"].tolist()[0] is None or pd.isna(a["v_lag1"].tolist()[0])
    assert a["v_lag1"].tolist()[2] is None or pd.isna(a["v_lag1"].tolist()[2])  # lag sees null v
    assert a["v_lead1"].tolist()[1] == 3.0


def test_ffill_bfill(events):
    f = ffill(events, "ent", "ts", "v").toPandas()
    a = f[f.ent == "a"].sort_values("ts")["v"].tolist()
    assert a == [1.0, 1.0, 3.0, 3.0, 5.0]
    b = bfill(events, "ent", "ts", "v").toPandas()
    bb = b[b.ent == "b"].sort_values("ts")["v"].tolist()
    assert bb == [10.0, 30.0, 30.0]


def test_sessionize_gap_boundary(events):
    out = sessionize(events, "ent", "ts", gap_seconds=1800).toPandas()
    a = out[out.ent == "a"].sort_values("ts")["session_id"].tolist()
    assert a == [1, 1, 2, 2, 3]
    b = out[out.ent == "b"].sort_values("ts")["session_id"].tolist()
    # 29m gap (1740s) <= 1800 → same session; 31m (1860s) > 1800 → new
    assert b == [1, 1, 2]


def test_session_bounds(events):
    out = session_bounds(events, "ent", "ts", 1800).toPandas()
    a = out[(out.ent == "a")].sort_values("session_id")
    assert a["n_events"].tolist() == [2, 2, 1]
    assert a["duration_seconds"].tolist() == [600.0, 300.0, 0.0]


def test_rolling_firstorder(spark):
    pdf = pd.DataFrame({
        "doc": ["d"] * 5, "pos": range(5), "x": [1.0, 2.0, 3.0, 4.0, 5.0]})
    df = spark.createDataFrame(pdf)
    out = rolling_firstorder(df, "doc", "pos", "x", radius=1).toPandas().sort_values("pos")
    assert out["roll_mean"].tolist() == [1.5, 2.0, 3.0, 4.0, 4.5]
    assert out["roll_count"].tolist() == [2, 3, 3, 3, 2]
    assert out["roll_range"].tolist() == [1.0, 2.0, 2.0, 2.0, 1.0]


def test_ngtdm_window_matches_kernel(spark):
    import numpy as np
    from pyradiomics_spark.kernels.ngtdm import ngtdm_matrix
    levels = [1, 2, 1, 2, 3, 3, 1]
    pdf = pd.DataFrame({"doc": ["d"] * 7, "pos": range(7), "level": levels})
    out = ngtdm_window(spark.createDataFrame(pdf), "doc", "pos", "level").toPandas()
    out = out.sort_values("pos")
    n_i, s_i, iv = ngtdm_matrix(np.array(levels))
    # sum of abs_diff grouped by level == s_i
    got = out.groupby("level")["abs_diff"].sum()
    for lvl, s in zip(iv, s_i):
        assert got[int(lvl)] == pytest.approx(s)


def test_gldm_window_matches_kernel(spark):
    import numpy as np
    from pyradiomics_spark.kernels.gldm import gldm_matrix
    levels = [1, 1, 2, 2, 2, 3]
    pdf = pd.DataFrame({"doc": ["d"] * 6, "pos": range(6), "level": levels})
    out = gldm_window(spark.createDataFrame(pdf), "doc", "pos", "level").toPandas()
    deps = out.sort_values("pos")["dependence"].tolist()
    assert deps == [1, 1, 1, 2, 1, 0]
    P, iv, jv = gldm_matrix(np.array(levels))
    # relational deps histogram == kernel matrix
    import collections
    hist = collections.Counter(zip(out["level"], out["dependence"] + 1))
    for (lvl, dep1), cnt in hist.items():
        assert P[list(iv).index(lvl), list(jv).index(dep1)] == cnt


def test_salting_deterministic(spark, events):
    s1 = with_salt(events, "ent", 4, extra_col="ts").toPandas()
    s2 = with_salt(events, "ent", 4, extra_col="ts").toPandas()
    assert (s1["__salt"] == s2["__salt"]).all()
    assert s1["__salt"].between(0, 3).all()


def test_skew_stats(spark, events):
    st = skew_stats(events, "ent").toPandas().iloc[0]
    assert st["n_keys"] == 2
    assert st["max_rows"] == 5
    assert st["skew_factor"] == pytest.approx(5 / 4)


def test_salted_asof_equals_plain(spark, rng):
    left = pd.DataFrame({
        "ent": rng.choice(["x", "y"], 200),
        "ts": pd.to_datetime(rng.integers(0, 10**6, 200), unit="s"),
        "lval": rng.normal(size=200)})
    right = pd.DataFrame({
        "ent": rng.choice(["x", "y"], 50),
        "rts": pd.to_datetime(rng.integers(0, 10**6, 50), unit="s"),
        "rval": rng.normal(size=50)})
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = asof_join(ldf, rdf, "ent", "ts", "rts").toPandas()
    salted = salted_asof_join(ldf, rdf, "ent", "ts", "rts", buckets=4).toPandas()
    key = ["ent", "ts", "lval"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = salted[plain.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_leakage_audit(spark, events):
    right = spark.createDataFrame(pd.DataFrame({
        "ent": ["a", "b"],
        "rts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:10"]),
        "rval": [1.0, 2.0]}))
    joined = asof_join(events, right, "ent", "ts", "rts")
    assert audit_cut(joined, "ts", "rts") == {"rts": 0}
    assert_no_leakage(joined, "ts", "rts")
    # adversarial: a deliberately leaky join must be caught
    leaky = events.crossJoin(
        right.select(F.col("rts"), F.col("rval"))).where(F.col("rts") > F.col("ts"))
    if leaky.count() > 0:
        v = audit_cut(leaky, "ts", "rts")
        assert v["rts"] > 0
        with pytest.raises(AssertionError):
            assert_no_leakage(leaky, "ts", "rts")


def test_rolling_median_exact_and_interpolated(spark):
    from pyradiomics_spark.operators.windows import rolling_median

    vals = [1.0, 9.0, 2.0, 8.0, 3.0, 100.0, 4.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], ["g", "i", "v"])
    got = {r.i: (r.roll_median, r.roll_median_p25)
           for r in rolling_median(df, "g", "i", "v", 1,
                                   probs=(0.25,)).collect()}
    import numpy as np
    for i in range(len(vals)):
        frame = vals[max(0, i - 1):i + 2]
        assert got[i][0] == pytest.approx(np.median(frame))
        assert got[i][1] == pytest.approx(np.percentile(frame, 25))


def test_rolling_median_spike_resistance(spark):
    """The robustness property rolling mean lacks: one spike never moves
    the median of a frame it doesn't dominate."""
    from pyradiomics_spark.operators.windows import rolling_median

    base = [("k", i, 5.0) for i in range(9)]
    spiked = [(g, i, 1e9 if i == 4 else v) for g, i, v in base]
    df = spark.createDataFrame(spiked, ["g", "i", "v"])
    out = {r.i: r.roll_median
           for r in rolling_median(df, "g", "i", "v", 2).collect()}
    assert all(out[i] == 5.0 for i in range(9))


def test_rolling_median_partition_isolation(spark):
    from pyradiomics_spark.operators.windows import rolling_median

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 3.0), ("b", 0, 100.0), ("b", 1, 200.0)],
        ["g", "i", "v"])
    out = {(r.g, r.i): r.roll_median
           for r in rolling_median(df, "g", "i", "v", 5).collect()}
    assert out[("a", 0)] == 2.0 and out[("b", 0)] == 150.0


def test_decayed_features_matches_numpy(spark):
    import math

    import numpy as np

    from pyradiomics_spark.operators.windows import decayed_features

    rng = np.random.default_rng(3)
    ts = np.sort(rng.uniform(0, 86400 * 10, 40))
    vals = rng.normal(10, 3, 40)
    rows = [("u", float(t), float(v)) for t, v in zip(ts, vals)]
    df = spark.createDataFrame(rows, ["user", "tsec", "v"]).select(
        "user", F.col("tsec").cast("timestamp").alias("ts"), "v")
    out = decayed_features(df, "user", "ts", "v", half_life=86400.0)
    got = [(r.decayed_sum, r.decayed_count)
           for r in out.orderBy("ts").collect()]
    lam = math.log(2.0) / 86400.0
    for i, (gs, gc) in enumerate(got):
        w = np.exp(-lam * (ts[i] - ts[: i + 1]))
        assert gs == pytest.approx((vals[: i + 1] * w).sum(), rel=1e-10)
        assert gc == pytest.approx(w.sum(), rel=1e-10)


def test_decayed_features_horizon_and_halflife(spark):
    from pyradiomics_spark.operators.windows import decayed_features

    rows = [("u", float(t), 1.0) for t in (0, 100, 200, 300)]
    df = spark.createDataFrame(rows, ["user", "tsec", "v"]).select(
        "user", F.col("tsec").cast("timestamp").alias("ts"), "v")
    # horizon 150s: at t=300 only t=200,300 are in frame
    out = {r.ts.timestamp() % 1000: r.decayed_count
           for r in decayed_features(df, "user", "ts", "v", half_life=100.0,
                                     horizon=150.0).collect()}
    assert out[300.0] == pytest.approx(1.0 + 0.5)  # self + 2^-1
    # a value exactly one half-life back contributes exactly half
    out2 = decayed_features(df, "user", "ts", "v",
                            half_life=100.0).orderBy("ts").collect()
    assert out2[1].decayed_count == pytest.approx(1.5)


def test_decayed_features_entity_isolation_and_ties(spark):
    from pyradiomics_spark.operators.windows import decayed_features

    rows = [("a", 0.0, 5.0), ("a", 10.0, 5.0),
            ("b", 10.0, 100.0), ("b", 10.0, 100.0)]  # b: tied timestamps
    df = spark.createDataFrame(rows, ["user", "tsec", "v"]).select(
        "user", F.col("tsec").cast("timestamp").alias("ts"), "v")
    out = decayed_features(df, "user", "ts", "v", half_life=10.0)
    b = out.where("user = 'b'").collect()
    # RANGE peers: both tied rows see the full tie group
    assert all(r.decayed_sum == pytest.approx(200.0) for r in b)
    a = out.where("user = 'a'").orderBy("ts").collect()
    assert a[0].decayed_sum == pytest.approx(5.0)  # no cross-entity leak


def test_hot_keys_ranking_and_share(spark):
    from pyradiomics_spark.operators.salting import hot_keys

    rows = [("h", i) for i in range(6)] + [("m", i) for i in range(3)] \
        + [("a", 0), ("b", 0), ("c", 0)]
    df = spark.createDataFrame(rows, ["k", "x"])
    out = hot_keys(df, "k", top_k=3).collect()
    assert [(r.k, r.n) for r in out] == [("h", 6), ("m", 3), ("a", 1)]
    assert out[0].share == 6 / 12
    # top_k bounds the output even with more distinct keys
    assert len(hot_keys(df, "k", top_k=2).collect()) == 2
    # plan: k-bounded TakeOrdered, no global sort
    plan = hot_keys(df, "k", top_k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ohlc_bars_deterministic_ties(spark):
    from pyradiomics_spark.operators.windows import ohlc_bars

    rows = [
        ("e", 0.0, 5.0), ("e", 1.0, 9.0), ("e", 2.0, 1.0), ("e", 3.0, 7.0),
        # equal-timestamp tie in the next bucket: open=min val, close=max
        ("e", 10.0, 4.0), ("e", 10.0, 6.0),
    ]
    df = spark.createDataFrame(rows, ["ent", "ts", "v"])
    got = {r.bucket: (r.open, r.high, r.low, r.close, r.n)
           for r in ohlc_bars(df, "ent", "ts", "v", width=10.0).collect()}
    assert got[0] == (5.0, 9.0, 1.0, 7.0, 4)
    assert got[1] == (4.0, 6.0, 4.0, 6.0, 2)


def test_resample_grid_fills_gaps(spark):
    import pytest as _pt

    from pyradiomics_spark.operators.windows import resample_grid

    rows = [("e", 5.0, 1.0), ("e", 12.0, 2.0), ("e", 41.0, 3.0),
            ("f", 100.0, 9.0)]
    df = spark.createDataFrame(rows, ["ent", "ts", "v"])
    out = resample_grid(df, "ent", "ts", "v", step=10.0)
    e = {r.bucket: (r.value, r.observed)
         for r in out.where("ent = 'e'").collect()}
    # buckets 0..4; gaps 2,3 carry bucket 1's value forward
    assert e == {0: (1.0, True), 1: (2.0, True), 2: (2.0, False),
                 3: (2.0, False), 4: (3.0, True)}
    f = {r.bucket: (r.value, r.observed)
         for r in out.where("ent = 'f'").collect()}
    assert f == {10: (9.0, True)}

    with _pt.raises(Exception, match="too large"):
        resample_grid(df, "ent", "ts", "v", step=10.0,
                      max_buckets=3).collect()


# ---------------------------------------------------------------------------
# scd2_compress
# ---------------------------------------------------------------------------

def test_scd2_compress_basic(spark):
    from datetime import datetime as DT

    from pyradiomics_spark.operators.windows import scd2_compress

    rows = [
        (1, DT(2024, 1, 1), "en", 10),
        (1, DT(2024, 1, 2), "en", 11),
        (1, DT(2024, 1, 3), "fr", 12),
        (1, DT(2024, 1, 4), "en", 13),
        (2, DT(2024, 1, 1), "de", 14),
    ]
    df = spark.createDataFrame(rows, ["uid", "ts", "lang", "eid"])
    out = scd2_compress(df, "uid", "ts", "lang", tie_col="eid")
    got = sorted(
        (r.uid, r.lang, r.valid_from, r.valid_to, r.n_events, r.is_current)
        for r in out.collect())
    assert got == [
        (1, "en", DT(2024, 1, 1), DT(2024, 1, 3), 2, False),
        (1, "en", DT(2024, 1, 4), None, 1, True),
        (1, "fr", DT(2024, 1, 3), DT(2024, 1, 4), 1, False),
        (2, "de", DT(2024, 1, 1), None, 1, True),
    ]


def test_scd2_compress_null_runs_and_ties(spark):
    from datetime import datetime as DT

    from pyradiomics_spark.operators.windows import scd2_compress

    # consecutive NULLs are ONE run; equal timestamps break on tie_col
    rows = [
        (1, DT(2024, 1, 1), None, 1),
        (1, DT(2024, 1, 1), None, 2),
        (1, DT(2024, 1, 2), "x", 3),
    ]
    df = spark.createDataFrame(rows, "uid int, ts timestamp, a string, eid int")
    out = scd2_compress(df, "uid", "ts", "a", tie_col="eid").collect()
    assert len(out) == 2
    nul = [r for r in out if r.a is None][0]
    assert nul.n_events == 2 and nul.valid_to == DT(2024, 1, 2)


def test_scd2_intervals_reconstruct_history(spark):
    """Round-trip: serving 'attr as of t' from the intervals equals the
    last raw observation at or before t, for every observed t."""
    import random
    from datetime import datetime as DT, timedelta

    from pyradiomics_spark.operators.windows import scd2_compress

    rnd = random.Random(3)
    rows = []
    eid = 0
    for uid in range(5):
        t = DT(2024, 1, 1)
        for _ in range(40):
            t += timedelta(minutes=rnd.randint(1, 90))
            rows.append((uid, t, rnd.choice("abc"), eid))
            eid += 1
    df = spark.createDataFrame(rows, ["uid", "ts", "a", "eid"])
    iv = {(r.uid): [] for r in df.select("uid").distinct().collect()}
    for r in scd2_compress(df, "uid", "ts", "a", tie_col="eid").collect():
        iv[r.uid].append(r)
    # brute-force expected value per (uid, ts)
    by_uid = {}
    for uid, t, a, e in rows:
        by_uid.setdefault(uid, []).append((t, e, a))
    for uid, obs in by_uid.items():
        obs.sort()
        n_total = 0
        for r in iv[uid]:
            n_total += r.n_events
            # every observation inside [valid_from, valid_to) has attr a
            for t, _, a in obs:
                if t >= r.valid_from and (r.valid_to is None or t < r.valid_to):
                    assert a == r.a
        assert n_total == len(obs)


# ---------------------------------------------------------------------------
# autocorrelation
# ---------------------------------------------------------------------------

def test_autocorrelation_matches_numpy(spark):
    import numpy as np
    from datetime import datetime as DT, timedelta

    from pyradiomics_spark.operators.windows import autocorrelation

    rng = np.random.default_rng(6)
    rows = []
    series = {}
    for uid in range(6):
        t = DT(2024, 1, 1)
        xs = np.cumsum(rng.normal(0, 1, 50))  # random walk: high ACF
        series[uid] = xs
        for i, v in enumerate(xs):
            t += timedelta(hours=1)
            rows.append((uid, t, float(v), i))
    df = spark.createDataFrame(rows, ["uid", "ts", "v", "eid"])
    got = {r.lag: (r.n_pairs, r.r)
           for r in autocorrelation(df, "uid", "ts", "v",
                                    lags=(1, 3), tie_col="eid").collect()}
    for k in (1, 3):
        xs = np.concatenate([series[u][k:] for u in range(6)])
        ys = np.concatenate([series[u][:-k] for u in range(6)])
        want = np.corrcoef(xs, ys)[0, 1]
        n, r = got[k]
        assert n == len(xs)
        assert r == pytest.approx(want, rel=1e-9)
    assert got[1][1] > 0.8  # random walk autocorrelates strongly


def test_autocorrelation_never_crosses_entities(spark):
    from datetime import datetime as DT

    from pyradiomics_spark.operators.windows import autocorrelation

    # two single-point entities: no valid pairs at any lag
    rows = [(1, DT(2024, 1, 1), 5.0, 0), (2, DT(2024, 1, 1), -5.0, 1)]
    df = spark.createDataFrame(rows, ["uid", "ts", "v", "eid"])
    out = {r.lag: (r.n_pairs, r.r)
           for r in autocorrelation(df, "uid", "ts", "v",
                                    lags=(1,)).collect()}
    assert out[1] == (0, None)


def test_autocorrelation_constant_series_null_r(spark):
    from datetime import datetime as DT, timedelta

    from pyradiomics_spark.operators.windows import autocorrelation

    t0 = DT(2024, 1, 1)
    rows = [(1, t0 + timedelta(hours=i), 2.5, i) for i in range(10)]
    df = spark.createDataFrame(rows, ["uid", "ts", "v", "eid"])
    out = autocorrelation(df, "uid", "ts", "v", lags=(1,)).collect()[0]
    assert out.n_pairs == 9 and out.r is None  # zero variance gated


def _py_rolling_slope(rows, k):
    """rows: (entity, ts, val) -> {(entity, ts): slope} with ts floats."""
    from collections import defaultdict

    by_e = defaultdict(list)
    for e, ts, v in rows:
        by_e[e].append((ts, v))
    out = {}
    for e, evs in by_e.items():
        evs.sort()
        m = min(ts for ts, _ in evs)
        for i in range(len(evs)):
            fr = evs[max(0, i - k + 1):i + 1]
            n = len(fr)
            xs = [ts - m for ts, _ in fr]
            ys = [v for _, v in fr]
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            den = n * sxx - sx * sx
            out[(e, evs[i][0])] = ((n * sxy - sx * sy) / den
                                   if n >= 2 and den > 0 else None)
    return out


def test_rolling_slope_matches_python(spark):
    from pyradiomics_spark.operators.windows import rolling_slope

    rows = [("a", 1.0, 2.0), ("a", 3.0, 6.0), ("a", 4.0, 8.0),
            ("a", 7.0, 14.0), ("a", 8.0, 10.0),
            ("b", 1.0, 5.0), ("b", 2.0, 5.0), ("b", 3.0, 5.0)]
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    got = {(r.e, r.ts): r.slope
           for r in rolling_slope(df, "e", "ts", "v",
                                  window_rows=3).collect()}
    want = _py_rolling_slope(rows, 3)
    assert set(got) == set(want)
    for key in want:
        if want[key] is None:
            assert got[key] is None
        else:
            assert got[key] == pytest.approx(want[key], rel=1e-12)
    # a is exactly linear y=2x over its first frames -> slope 2
    assert got[("a", 4.0)] == pytest.approx(2.0, rel=1e-12)
    # constant series has slope 0, not NULL (time variance > 0)
    assert got[("b", 3.0)] == pytest.approx(0.0, abs=1e-15)
    # single-point frame is NULL
    assert got[("a", 1.0)] is None


def test_rolling_slope_epoch_magnitude_stable(spark):
    """Realistic epoch-seconds timestamps must not lose the slope to
    floating cancellation (the rebase regression guard)."""
    from pyradiomics_spark.operators.windows import rolling_slope

    t0 = 1_700_000_000.0
    rows = [("e", t0 + 3600.0 * i, 10.0 + 2.5 * i) for i in range(6)]
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    got = rolling_slope(df, "e", "ts", "v", window_rows=4).collect()
    last = max(got, key=lambda r: r.ts)
    assert last.slope == pytest.approx(2.5 / 3600.0, rel=1e-9)


def test_rolling_slope_rejects_window(spark):
    from pyradiomics_spark.operators.windows import rolling_slope

    df = spark.createDataFrame([("e", 1.0, 1.0)], ["e", "ts", "v"])
    with pytest.raises(ValueError):
        rolling_slope(df, "e", "ts", "v", window_rows=1)


def _py_cusum(rows):
    """rows: (entity, ts, val) -> entity -> (n, cp_ts, score)."""
    import math
    from collections import defaultdict

    by_e = defaultdict(list)
    for e, ts, v in rows:
        by_e[e].append((ts, v))
    out = {}
    for e, evs in by_e.items():
        evs.sort()
        xs = [v for _, v in evs]
        n = len(xs)
        mean = sum(xs) / n
        var = sum(x * x for x in xs) / n - mean * mean
        best = None
        run = 0.0
        for i, (ts, v) in enumerate(evs):
            run += v
            s = abs(run - (i + 1) * mean)
            if best is None or s > best[0]:
                best = (s, ts)
        score = (best[0] / (math.sqrt(var) * math.sqrt(n))
                 if var > 0 else None)
        out[e] = (n, best[1], score)
    return out


def test_cusum_matches_python(spark):
    from pyradiomics_spark.operators.windows import cusum_changepoint

    # regime shift at ts 5 for a; constant series for c
    rows = ([("a", float(i), 1.0) for i in range(5)]
            + [("a", float(i), 9.0) for i in range(5, 10)]
            + [("b", float(i), float(i % 3)) for i in range(7)]
            + [("c", float(i), 4.0) for i in range(4)])
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    got = {r.e: (r.n, r.cp_ts, r.score)
           for r in cusum_changepoint(df, "e", "ts", "v").collect()}
    want = _py_cusum(rows)
    assert set(got) == set(want)
    for e in want:
        assert got[e][0] == want[e][0]
        assert got[e][1] == pytest.approx(want[e][1])
        if want[e][2] is None:
            assert got[e][2] is None
        else:
            assert got[e][2] == pytest.approx(want[e][2], rel=1e-12)
    # the shift point: |S| peaks at the last pre-shift row (ts 4)
    assert got["a"][1] == 4.0
    # a strong shift scores far above the noise series
    assert got["a"][2] > got["b"][2]


def _py_mase(rows, season):
    from collections import defaultdict

    by_e = defaultdict(list)
    for e, ts, v in rows:
        by_e[e].append((ts, v))
    out = {}
    for e, evs in by_e.items():
        ys = [v for _, v in sorted(evs)]
        es = [abs(ys[i] - ys[i - season])
              for i in range(season, len(ys))]
        e1 = [abs(ys[i] - ys[i - 1]) for i in range(1, len(ys))]
        num = sum(es) / len(es) if es else None
        den = sum(e1) / len(e1) if e1 else None
        out[e] = (len(es),
                  num / den if es and den and den > 0 else None)
    return out


def test_mase_matches_python(spark):
    from pyradiomics_spark.operators.windows import mase_eval

    # a: perfect period-2 series (seasonal naive wins); b: trend;
    # c: constant (NULL); d: too short
    rows = ([("a", float(i), float(i % 2)) for i in range(8)]
            + [("b", float(i), 3.0 * i) for i in range(6)]
            + [("c", float(i), 7.0) for i in range(5)]
            + [("d", 0.0, 1.0)])
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    for season in (1, 2):
        got = {r.e: (r.n_scored, r.mase)
               for r in mase_eval(df, "e", "ts", "v",
                                  season=season).collect()}
        want = _py_mase(rows, season)
        assert set(got) == set(want)
        for e in want:
            assert got[e][0] == want[e][0]
            if want[e][1] is None:
                assert got[e][1] is None
            else:
                assert got[e][1] == pytest.approx(want[e][1], rel=1e-12)
    got2 = {r.e: r.mase
            for r in mase_eval(df, "e", "ts", "v", season=2).collect()}
    # period-2 series: seasonal-naive is exact -> mase 0
    assert got2["a"] == pytest.approx(0.0, abs=1e-15)
    # linear trend: |y_t - y_{t-2}| = 2*|y_t - y_{t-1}| -> mase 2
    assert got2["b"] == pytest.approx(2.0, rel=1e-12)


def test_mase_rejects_bad_season(spark):
    from pyradiomics_spark.operators.windows import mase_eval

    df = spark.createDataFrame([("e", 1.0, 1.0)], ["e", "ts", "v"])
    with pytest.raises(ValueError):
        mase_eval(df, "e", "ts", "v", season=0)


def _py_seasonality(rows, bucket_fn):
    from collections import defaultdict

    by_e = defaultdict(list)
    for e, ts, v in rows:
        by_e[e].append((bucket_fn(ts), v))
    out = {}
    for e, pairs in by_e.items():
        xs = [v for _, v in pairs]
        n = len(xs)
        s = sum(xs)
        q = sum(v * v for v in xs)
        by_h = defaultdict(list)
        for h, v in pairs:
            by_h[h].append(v)
        ssb_raw = sum(sum(vs) ** 2 / len(vs) for vs in by_h.values())
        sst = q - s * s / n
        out[e] = (n, len(by_h),
                  (ssb_raw - s * s / n) / sst
                  if n >= 2 and sst > 0 else None)
    return out


def test_seasonality_matches_python(spark):
    import datetime as dt

    from pyradiomics_spark.operators.windows import seasonality_strength

    base = dt.datetime(2024, 1, 1)
    rows = []
    # bot: value is a pure function of hour -> strength 1
    for day in range(4):
        for h in (2, 9, 14):
            rows.append(("bot", base + dt.timedelta(days=day, hours=h),
                         10.0 * h))
    # human: same value at all hours -> sst 0 -> NULL
    for i in range(6):
        rows.append(("flat", base + dt.timedelta(hours=i), 5.0))
    # mixed: noise across hours
    for i in range(12):
        rows.append(("mix", base + dt.timedelta(hours=i * 7),
                     float((i * 13) % 5)))
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    got = {r.e: (r.n, r.n_buckets, r.strength)
           for r in seasonality_strength(df, "e", "ts", "v").collect()}
    want = _py_seasonality(rows, lambda ts: ts.hour)
    assert set(got) == set(want)
    for e in want:
        assert got[e][:2] == want[e][:2]
        if want[e][2] is None:
            assert got[e][2] is None
        else:
            assert got[e][2] == pytest.approx(want[e][2], rel=1e-12)
    assert got["bot"][2] == pytest.approx(1.0, rel=1e-12)
    assert got["flat"][2] is None


def test_seasonality_rejects_bad_bucket(spark):
    from pyradiomics_spark.operators.windows import seasonality_strength

    df = spark.createDataFrame([("e", 1.0, 1.0)], ["e", "ts", "v"])
    with pytest.raises(ValueError):
        seasonality_strength(df, "e", "ts", "v", bucket="minute")


def test_cusum_fuzz_random_series(spark):
    import numpy as np

    from pyradiomics_spark.operators.windows import cusum_changepoint

    rng = np.random.default_rng(31)
    rows = []
    for e in range(25):
        n = int(rng.integers(3, 40))
        shift = float(rng.normal()) * 5.0
        cp = int(rng.integers(1, n))
        for i in range(n):
            v = float(rng.normal()) + (shift if i >= cp else 0.0)
            rows.append((f"e{e:02d}", float(i), v))
    df = spark.createDataFrame(rows, ["e", "ts", "v"])
    got = {r.e: (r.n, r.cp_ts, r.score)
           for r in cusum_changepoint(df, "e", "ts", "v").collect()}
    want = _py_cusum(rows)
    assert set(got) == set(want)
    for e in want:
        assert got[e][0] == want[e][0]
        assert got[e][1] == pytest.approx(want[e][1])
        if want[e][2] is None:
            assert got[e][2] is None
        else:
            assert got[e][2] == pytest.approx(want[e][2], rel=1e-9)
