"""Voxel-mode (per-position) feature maps: numpy kernel vs the fully
relational collect_list-window form, plus edge truncation semantics."""

import numpy as np
import pandas as pd
import pytest

from pyradiomics_spark.config import ExtractionSettings
from pyradiomics_spark.operators.voxel import rolling_texture, _rolling_maps


def test_rolling_maps_brute():
    levels = np.array([1, 2, 1, 3, 3, 1])
    ent, uni, con = _rolling_maps(levels, radius=1)
    # pos 0 window [1,2]: p=.5/.5 → entropy 1, uniformity .5, contrast mean((2-1)²)=1
    assert ent[0] == pytest.approx(1.0, abs=1e-9)
    assert uni[0] == pytest.approx(0.5)
    assert con[0] == pytest.approx(1.0)
    # pos 4 window [3,3,1]: p=2/3,1/3
    p = np.array([2 / 3, 1 / 3])
    assert ent[4] == pytest.approx(float(-(p * np.log2(p)).sum()), abs=1e-6)
    # flat window → entropy 0, uniformity 1
    flat_ent, flat_uni, _ = _rolling_maps(np.array([5, 5, 5]), radius=1)
    assert flat_uni[1] == 1.0
    assert flat_ent[1] == pytest.approx(0.0, abs=1e-9)


def test_rolling_texture_matches_relational(spark):
    from pyspark.sql import functions as F, Window

    pdf = pd.DataFrame({
        "doc_id": [1] * 6 + [2] * 3,
        "text": ["a bb a ccc ccc a".replace(" ", " ")] * 6 + ["dd dd e"] * 3})
    # one row per doc is the real shape:
    pdf = pdf.drop_duplicates("doc_id").reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    out = rolling_texture(
        df, keys=("doc_id",), radius=2,
        settings=ExtractionSettings(bin_width=1.0)).toPandas()

    # relational twin: explode tokens → collect_list window → HOF entropy
    t = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).where(F.col("tok") != "").withColumn("tok_len", F.length("tok"))
    w = Window.partitionBy("doc_id")
    lv = t.withColumn(
        "level", (F.col("tok_len") - F.min("tok_len").over(w) + 1).cast("int"))
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-2, 2)
    with_lst = lv.withColumn("lst", F.collect_list("level").over(frame))
    n = F.size("lst")
    p_of = lambda v: F.size(F.filter(F.col("lst"), lambda x: x == v)) / n  # noqa: E731
    ent = -F.aggregate(
        F.transform(F.array_distinct("lst"), lambda v: p_of(v) * F.log2(p_of(v))),
        F.lit(0.0), lambda acc, x: acc + x)
    rel = with_lst.select("doc_id", "pos", ent.alias("rel_entropy")).toPandas()

    m = out.merge(rel, on=["doc_id", "pos"])
    assert len(m) == len(out) > 0
    np.testing.assert_allclose(
        m["roll_entropy"].to_numpy(), m["rel_entropy"].to_numpy(), atol=1e-9)
