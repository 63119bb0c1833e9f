"""Funnel / cohort retention vs hand-computed references."""

import pytest

from pyradiomics_spark.operators.events import cohort_retention, funnel


def test_funnel_order_sensitivity(spark):
    rows = [
        # u1: view -> click -> purchase, fully ordered
        ("u1", 10.0, "view"), ("u1", 20.0, "click"),
        ("u1", 30.0, "purchase"),
        # u2: purchase BEFORE first view must not count; click after view
        ("u2", 5.0, "purchase"), ("u2", 10.0, "view"),
        ("u2", 15.0, "click"),
        # u3: click only (no view) -> stage 0
        ("u3", 7.0, "click"),
        # u4: view at same ts as click -> strict ordering drops the click
        ("u4", 9.0, "view"), ("u4", 9.0, "click"),
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "etype"])
    out = {r.user: r for r in funnel(
        df, "user", "ts", "etype",
        ("view", "click", "purchase")).collect()}
    assert out["u1"].max_stage == 3
    assert (out["u1"].ts_stage_1, out["u1"].ts_stage_2,
            out["u1"].ts_stage_3) == (10.0, 20.0, 30.0)
    assert out["u2"].max_stage == 2 and out["u2"].ts_stage_3 is None
    assert out["u3"].max_stage == 0
    assert out["u4"].max_stage == 1
    assert len(out) == 4  # every user present, even stage-0


def test_funnel_repeated_events_take_first_eligible(spark):
    rows = [("u", 1.0, "a"), ("u", 2.0, "a"), ("u", 0.5, "b"),
            ("u", 3.0, "b"), ("u", 4.0, "b")]
    df = spark.createDataFrame(rows, ["user", "ts", "etype"])
    r = funnel(df, "user", "ts", "etype", ("a", "b")).collect()[0]
    assert (r.ts_stage_1, r.ts_stage_2, r.max_stage) == (1.0, 3.0, 2)


def test_cohort_retention_matrix(spark):
    day = 86400.0
    rows = [
        ("a", 0.5 * day), ("a", 8.0 * day),    # cohort 0, offsets 0 and 1
        ("b", 1.0 * day),                       # cohort 0, offset 0 only
        ("c", 7.5 * day), ("c", 22.0 * day),   # cohort 1, offsets 0 and 2
        ("c", 7.9 * day),                       # same bucket, distinct once
    ]
    df = spark.createDataFrame(rows, ["user", "ts"])
    got = {(r.cohort, r.bucket_offset): r.n_users
           for r in cohort_retention(df, "user", "ts").collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}

    with pytest.raises(ValueError, match="bucket_days"):
        cohort_retention(df, "user", "ts", bucket_days=0)
    with pytest.raises(ValueError, match="stage"):
        funnel(df.withColumnRenamed("ts", "t"), "user", "t", "user", ())


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------

def test_event_transitions_matches_python(spark):
    from collections import Counter, defaultdict
    from datetime import datetime as DT, timedelta
    import random

    from pyradiomics_spark.operators.events import event_transitions

    rnd = random.Random(5)
    rows = []
    eid = 0
    for uid in range(8):
        t = DT(2024, 1, 1)
        for _ in range(30):
            t += timedelta(minutes=rnd.randint(1, 30))
            rows.append((eid, uid, t, rnd.choice("abc")))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "uid", "ts", "etype"])
    got = {(r.prev_type, r.next_type): (r.n, r.prob)
           for r in event_transitions(df, "uid", "ts", "etype",
                                      tie_col="event_id").collect()}
    cnt = Counter()
    by_uid = defaultdict(list)
    for _, uid, t, e in rows:
        by_uid[uid].append((t, e))
    for uid, seq in by_uid.items():
        seq.sort()
        for (_, p), (_, n) in zip(seq, seq[1:]):
            cnt[(p, n)] += 1
    tot = Counter()
    for (p, _), c in cnt.items():
        tot[p] += c
    want = {k: (c, c / tot[k[0]]) for k, c in cnt.items()}
    assert set(got) == set(want)
    for k, (n, p) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(p, rel=1e-12)


def test_event_transitions_probs_row_normalized(spark):
    from datetime import datetime as DT

    from pyradiomics_spark.operators.events import event_transitions

    rows = [(i, 1, DT(2024, 1, 1, i), e)
            for i, e in enumerate("aabab")]
    df = spark.createDataFrame(rows, ["event_id", "uid", "ts", "etype"])
    out = event_transitions(df, "uid", "ts", "etype").collect()
    by_prev = {}
    for r in out:
        by_prev.setdefault(r.prev_type, 0.0)
        by_prev[r.prev_type] += r.prob
    for s in by_prev.values():
        assert s == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# ab_welch_ttest
# ---------------------------------------------------------------------------

def test_ab_welch_ttest_matches_numpy(spark):
    import numpy as np

    from pyradiomics_spark.operators.events import ab_welch_ttest

    rng = np.random.default_rng(9)
    rows = []
    for g in ("view", "click"):
        for arm in (0, 1):
            for v in rng.normal(10 + arm * 0.5, 2.0, size=40):
                rows.append((g, arm, float(v)))
    df = spark.createDataFrame(rows, ["grp", "arm", "value"])
    got = {r.grp: r for r in
           ab_welch_ttest(df, "grp", "arm", "value").collect()}
    for g in ("view", "click"):
        xs = np.array([v for gg, a, v in rows if gg == g and a == 0])
        ys = np.array([v for gg, a, v in rows if gg == g and a == 1])
        va, vb = xs.var(ddof=1), ys.var(ddof=1)
        se2 = va / xs.size + vb / ys.size
        t = (xs.mean() - ys.mean()) / np.sqrt(se2)
        dof = se2**2 / ((va / xs.size)**2 / (xs.size - 1)
                        + (vb / ys.size)**2 / (ys.size - 1))
        r = got[g]
        assert (r.n_a, r.n_b) == (40, 40)
        assert r.mean_a == pytest.approx(xs.mean(), rel=1e-12)
        assert r.t_stat == pytest.approx(t, rel=1e-9)
        assert r.dof == pytest.approx(dof, rel=1e-9)


def test_ab_welch_ttest_degenerate_arms_null(spark):
    from pyradiomics_spark.operators.events import ab_welch_ttest

    rows = [("g", 0, 1.0), ("g", 1, 2.0), ("g", 1, 3.0),  # n_a < 2
            ("h", 0, 5.0), ("h", 0, 5.0), ("h", 1, 5.0), ("h", 1, 5.0)]
    df = spark.createDataFrame(rows, ["grp", "arm", "value"])
    got = {r.grp: r for r in
           ab_welch_ttest(df, "grp", "arm", "value").collect()}
    assert got["g"].t_stat is None and got["g"].dof is None
    # both arms constant → se2 == 0 → gated NULL, not inf/NaN
    assert got["h"].t_stat is None


# ---------------------------------------------------------------------------
# session_paths
# ---------------------------------------------------------------------------

def test_session_paths_matches_python(spark):
    from collections import Counter
    from datetime import datetime as DT, timedelta
    import random

    from pyradiomics_spark.operators.events import session_paths

    rnd = random.Random(41)
    rows, eid = [], 0
    ref_paths = Counter()
    for uid in range(10):
        t = DT(2024, 1, 1)
        n_sessions = rnd.randint(1, 4)
        for _ in range(n_sessions):
            t += timedelta(seconds=3600)  # > gap: new session
            path = [rnd.choice("abc") for _ in range(rnd.randint(1, 4))]
            for e in path:
                rows.append((eid, uid, t, e))
                eid += 1
                t += timedelta(seconds=rnd.randint(1, 900))  # < gap
            ref_paths[">".join(path)] += 1
    df = spark.createDataFrame(rows, ["event_id", "uid", "ts", "etype"])
    got = [(r.path, r.n) for r in session_paths(
        df, "uid", "ts", "etype", gap_seconds=1800.0, top_k=50,
        tie_col="event_id").collect()]
    want = sorted(ref_paths.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == want


def test_session_paths_tie_order_deterministic(spark):
    from datetime import datetime as DT

    from pyradiomics_spark.operators.events import session_paths

    t = DT(2024, 1, 1)
    rows = [(2, 1, t, "b"), (1, 1, t, "a"), (3, 1, t, "c")]
    df = spark.createDataFrame(rows, ["event_id", "uid", "ts", "etype"])
    out = session_paths(df, "uid", "ts", "etype",
                        tie_col="event_id").collect()
    assert [(r.path, r.n) for r in out] == [("a>b>c", 1)]


def _py_attribution(rows, conv):
    """rows: (user, ts, type) sorted input; returns channel ->
    (first_touch, last_touch)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, t in rows:
        by_user[u].append((ts, t))
    first = defaultdict(int)
    last = defaultdict(int)
    for u, evs in by_user.items():
        evs.sort()
        seen = []
        for _, t in evs:
            if t == conv:
                f = next((x for x in seen if x != conv), None)
                l = next((x for x in reversed(seen) if x != conv), None)
                first[f] += 1
                last[l] += 1
            seen.append(t)
    return {c: (first.get(c, 0), last.get(c, 0))
            for c in set(first) | set(last)}


def test_attribution_matches_python(spark):
    from pyradiomics_spark.operators.events import conversion_attribution

    rows = [
        (1, 1.0, "ad"), (1, 2.0, "email"), (1, 3.0, "buy"),
        (1, 4.0, "ad"), (1, 5.0, "buy"),          # 2nd conv, same user
        (2, 1.0, "buy"),                           # no prior touch
        (2, 2.0, "search"), (2, 3.0, "buy"),
        (3, 1.0, "email"), (3, 2.0, "ad"), (3, 3.0, "buy"),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "t"])
    got = {r.channel: (r.first_touch, r.last_touch)
           for r in conversion_attribution(df, "u", "ts", "t",
                                           "buy").collect()}
    assert got == _py_attribution(rows, "buy")
    # both models each account for every conversion exactly once
    n_conv = sum(1 for _, _, t in rows if t == "buy")
    assert sum(v[0] for v in got.values()) == n_conv
    assert sum(v[1] for v in got.values()) == n_conv


def test_attribution_first_vs_last_disagree(spark):
    from pyradiomics_spark.operators.events import conversion_attribution

    df = spark.createDataFrame(
        [(1, 1.0, "ad"), (1, 2.0, "email"), (1, 3.0, "buy")],
        ["u", "ts", "t"])
    got = {r.channel: (r.first_touch, r.last_touch)
           for r in conversion_attribution(df, "u", "ts", "t",
                                           "buy").collect()}
    assert got == {"ad": (1, 0), "email": (0, 1)}


def _py_concentration(pairs):
    """pairs: (group, unit) rows -> group -> (n_units, hhi, gini)."""
    from collections import Counter, defaultdict

    counts = Counter(pairs)
    by_g = defaultdict(dict)
    for (g, u), c in counts.items():
        by_g[g][u] = c
    out = {}
    for g, d in by_g.items():
        n = len(d)
        tot = sum(d.values())
        hhi = sum((c / tot) ** 2 for c in d.values())
        ranked = sorted(d.items(), key=lambda kv: (kv[1], kv[0]))
        gini = sum((2 * (i + 1) - n - 1) * c
                   for i, (_, c) in enumerate(ranked)) / (n * tot)
        out[g] = (n, hhi, gini)
    return out


def test_concentration_matches_python(spark):
    import pytest

    from pyradiomics_spark.functions.textstats import concentration_metrics

    pairs = ([("en", "h1")] * 50 + [("en", "h2")] * 30
             + [("en", "h3")] * 20
             + [("de", "h1")] * 25 + [("de", "h4")] * 25)
    df = spark.createDataFrame(pairs, ["lang", "host"])
    got = {r.lang: (r.n_units, r.hhi, r.gini)
           for r in concentration_metrics(df, "lang", "host").collect()}
    want = _py_concentration(pairs)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], rel=1e-12)
        assert got[g][2] == pytest.approx(want[g][2], rel=1e-12)
    # de is a perfect 50/50 duopoly: hhi 0.5, gini 0
    assert got["de"][1] == pytest.approx(0.5)
    assert got["de"][2] == pytest.approx(0.0, abs=1e-15)


def test_concentration_monopoly_extremes(spark):
    import pytest

    from pyradiomics_spark.functions.textstats import concentration_metrics

    df = spark.createDataFrame([("g", "only")] * 10, ["g", "h"])
    r = concentration_metrics(df, "g", "h").collect()[0]
    assert (r.n_units, r.hhi) == (1, pytest.approx(1.0))
    assert r.gini == pytest.approx(0.0, abs=1e-15)


def _py_rfm(rows, n_tiles=5):
    from collections import defaultdict

    by_u = defaultdict(list)
    for u, ts, v in rows:
        by_u[u].append((ts, v))
    users = sorted(by_u)
    last = {u: max(ts for ts, _ in by_u[u]) for u in users}
    ref = max(last.values())
    rec = {u: (ref - last[u]) / 86400.0 for u in users}
    freq = {u: len(by_u[u]) for u in users}
    mon = {u: sum(v for _, v in by_u[u]) for u in users}

    def ntile(keys, n):
        cnt = len(keys)
        out = {}
        for i, u in enumerate(keys):
            # SQL ntile: first (cnt % n) tiles get ceil(cnt/n)
            big = cnt % n
            size = cnt // n
            if i < big * (size + 1):
                t = i // (size + 1) + 1
            else:
                t = big + (i - big * (size + 1)) // size + 1
            out[u] = n + 1 - t
        return out

    r = ntile(sorted(users, key=lambda u: (rec[u], u)), n_tiles)
    f = ntile(sorted(users, key=lambda u: (-freq[u], u)), n_tiles)
    m = ntile(sorted(users, key=lambda u: (-mon[u], u)), n_tiles)
    return {u: (rec[u], freq[u], mon[u], r[u], f[u], m[u]) for u in users}


def test_rfm_matches_python(spark):
    import pytest

    from pyradiomics_spark.operators.events import rfm_segments

    rows = []
    for u in range(12):
        for i in range(u + 1):                    # freq varies 1..12
            rows.append((u, 86400.0 * (u + i), float(u * 10 + i)))
    df = spark.createDataFrame(rows, ["u", "ts", "v"])
    got = {r.u: (r.recency_days, r.frequency, r.monetary,
                 r.r_score, r.f_score, r.m_score, r.rfm)
           for r in rfm_segments(df, "u", "ts", "v").collect()}
    want = _py_rfm(rows)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == pytest.approx(want[u][0])
        assert got[u][1:6] == want[u][1:]
        assert got[u][6] == "".join(str(s) for s in want[u][3:])
    # scores span the full 1..5 range on 12 users
    assert {g[3] for g in got.values()} == set(range(1, 6))


def test_rfm_rejects_tiles(spark):
    import pytest

    from pyradiomics_spark.operators.events import rfm_segments

    df = spark.createDataFrame([(1, 1.0, 1.0)], ["u", "ts", "v"])
    with pytest.raises(ValueError):
        rfm_segments(df, "u", "ts", "v", n_tiles=1)


def test_group_percentiles_exact(spark):
    import numpy as np
    import pytest

    from pyradiomics_spark.operators.events import group_percentiles

    vals = [float(v) for v in range(1, 101)]
    rows = [("a", v) for v in vals] + [("b", 7.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {(r.g, r.p): r.value
           for r in group_percentiles(df, "g", "v",
                                      (0.0, 0.5, 0.9, 1.0)).collect()}
    for p in (0.0, 0.5, 0.9, 1.0):
        # Spark `percentile` is linear interpolation == numpy default
        assert got[("a", p)] == pytest.approx(
            float(np.percentile(vals, p * 100)), rel=1e-12)
        assert got[("b", p)] == 7.0
    with pytest.raises(ValueError):
        group_percentiles(df, "g", "v", (1.5,))


def _py_markov_entropy(rows):
    import math
    from collections import Counter, defaultdict

    by_u = defaultdict(list)
    for u, ts, t in rows:
        by_u[u].append((ts, t))
    trans = Counter()
    for u, evs in by_u.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            trans[(a[1], b[1])] += 1
    n = sum(trans.values())
    out_tot = Counter()
    for (a, _), c in trans.items():
        out_tot[a] += c
    h = sum(-(c / n) * math.log2(c / out_tot[a])
            for (a, _), c in trans.items())
    return n, len(trans), h


def test_markov_entropy_matches_python(spark):
    import pytest

    from pyradiomics_spark.operators.events import markov_entropy

    rows = []
    import random

    rnd = random.Random(9)
    for u in range(8):
        for i in range(rnd.randint(3, 15)):
            rows.append((u, float(i), rnd.choice("abc")))
    df = spark.createDataFrame(rows, ["u", "ts", "t"])
    got = markov_entropy(df, "u", "ts", "t").collect()[0]
    n, s, h = _py_markov_entropy(rows)
    assert (got.n_transitions, got.n_states) == (n, s)
    assert got.entropy_bits == pytest.approx(h, rel=1e-12)


def test_markov_entropy_deterministic_chain_is_zero(spark):
    import pytest

    from pyradiomics_spark.operators.events import markov_entropy

    # a scripted bot loop a->b->c->a...: every transition deterministic
    rows = [(1, float(i), "abc"[i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, ["u", "ts", "t"])
    got = markov_entropy(df, "u", "ts", "t").collect()[0]
    assert got.entropy_bits == pytest.approx(0.0, abs=1e-15)
