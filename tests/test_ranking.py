"""RRF fusion and NDCG@k vs hand-rolled python references."""

import math

import pytest

from pyradiomics_spark.operators.ranking import ndcg_at_k, rrf_fuse


def test_rrf_matches_python(spark):
    run_a = [("d1", 1), ("d2", 2), ("d3", 3)]
    run_b = [("d3", 1), ("d1", 2), ("d4", 3)]
    a = spark.createDataFrame(run_a, ["doc", "rank"])
    b = spark.createDataFrame(run_b, ["doc", "rank"])
    got = {r.doc: (r.rrf_score, r.n_lists)
           for r in rrf_fuse([a, b], "doc", k=60).collect()}
    want = {}
    for run in (run_a, run_b):
        for d, rk in run:
            s, n = want.get(d, (0.0, 0))
            want[d] = (s + 1.0 / (60 + rk), n + 1)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == pytest.approx(want[d][0], rel=1e-15)
        assert got[d][1] == want[d][1]
    # d1 (ranks 1+2) outscores d3 (ranks 3+1)? 1/61+1/62 vs 1/63+1/61
    assert got["d1"][0] > got["d3"][0]
    assert got["d4"][1] == 1


def test_rrf_rejects_degenerate_inputs(spark):
    df = spark.createDataFrame([("d", 1)], ["doc", "rank"])
    with pytest.raises(ValueError):
        rrf_fuse([df], "doc")
    with pytest.raises(ValueError):
        rrf_fuse([df, df], "doc", k=0)


def _py_ndcg(items, k):
    """items: list of (score, rel) for one query; ties broken by rel
    asc then insertion is avoided by unique scores in tests."""
    run = sorted(items, key=lambda t: -t[0])[:k]
    ideal = sorted(items, key=lambda t: -t[1])[:k]
    dcg = sum((2 ** rel - 1) / math.log2(r + 2)
              for r, (_, rel) in enumerate(run))
    idcg = sum((2 ** rel - 1) / math.log2(r + 2)
               for r, (_, rel) in enumerate(ideal))
    return dcg, idcg, (dcg / idcg if idcg > 0 else None)


def test_ndcg_matches_python(spark):
    items = [(9.0, 3), (8.0, 0), (7.0, 2), (6.0, 3), (5.0, 1),
             (4.0, 0), (3.0, 2), (2.0, 0), (1.0, 1), (0.5, 0)]
    df = spark.createDataFrame(
        [("q", s, r, i) for i, (s, r) in enumerate(items)],
        ["q", "score", "rel", "item"])
    for k in (3, 5, 10):
        row = ndcg_at_k(df, "q", "score", "rel", k=k,
                        tie_col="item").collect()[0]
        dcg, idcg, nd = _py_ndcg(items, k)
        assert row.dcg == pytest.approx(dcg, rel=1e-12)
        assert row.idcg == pytest.approx(idcg, rel=1e-12)
        assert row.ndcg == pytest.approx(nd, rel=1e-12)


def test_ndcg_perfect_and_zero(spark):
    # run ordered exactly by relevance -> ndcg 1; no relevant -> NULL
    rows = ([("p", float(10 - i), 5 - i, i) for i in range(5)]
            + [("z", float(i), 0, i) for i in range(4)])
    df = spark.createDataFrame(rows, ["q", "score", "rel", "item"])
    got = {r.q: r.ndcg
           for r in ndcg_at_k(df, "q", "score", "rel", k=5,
                              tie_col="item").collect()}
    assert got["p"] == pytest.approx(1.0, abs=1e-15)
    assert got["z"] is None


def test_ndcg_rejects_bad_k(spark):
    df = spark.createDataFrame([("q", 1.0, 1, 1)],
                               ["q", "score", "rel", "item"])
    with pytest.raises(ValueError):
        ndcg_at_k(df, "q", "score", "rel", k=0)


def test_ndcg_rejects_negative_relevance(spark):
    df = spark.createDataFrame([("q", 1.0, -1, 1), ("q", 0.5, 2, 2)],
                               ["q", "score", "rel", "item"])
    with pytest.raises(Exception, match="relevance"):
        ndcg_at_k(df, "q", "score", "rel", k=5, tie_col="item").collect()
