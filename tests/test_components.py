"""Connected components (large-star/small-star) vs a driver-side
union-find oracle, incl. the long-chain case that breaks O(diameter)
label propagation budgets."""

import random

import pytest

from pyradiomics_spark.operators.components import (
    connected_components, dedup_by_components)


def _union_find_truth(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: min(comp[find(n)]) for n in parent}


def test_components_match_union_find(spark):
    random.seed(3)
    edges = [(random.randrange(200), random.randrange(200))
             for _ in range(150)]
    edges += [(1000 + i, 1000 + i + 1) for i in range(60)]  # 61-node chain
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component
           for r in connected_components(df).collect()}
    assert got == _union_find_truth(edges)


def test_components_all_ids_singletons(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    ids = spark.createDataFrame([(1,), (2,), (7,)], "doc_id long")
    got = {r.id: r.component
           for r in connected_components(df, all_ids=ids).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


def test_dedup_by_components_transitive(spark):
    """Chain a-b-c: component dedup keeps ONE doc; pairwise loser-dropping
    would keep a leaf too."""
    docs = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (9, "w")], "id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r.id for r in
                  dedup_by_components(docs, pairs, "id").collect())
    assert kept == [1, 9]


def test_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=0)
