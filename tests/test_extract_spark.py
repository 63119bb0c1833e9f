"""End-to-end extraction over Spark: mapInPandas kernel vs driver-side
direct kernel calls on the same synthetic pages (golden cross-check)."""

import numpy as np
import pandas as pd
import pytest

from pyradiomics_spark.config import ExtractionSettings
from pyradiomics_spark.functions.text import text_to_intensity
from pyradiomics_spark.kernels import discretize, firstorder_features, glcm_features
from pyradiomics_spark.operators.features import (
    extract_features, melt_features, _extract_one, feature_columns)
from pyradiomics_spark.sources.pages import pages_pdf, pages_df, PAGES_SCHEMA


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(pages_pdf(12), schema=PAGES_SCHEMA).cache()


def test_extract_matches_local_kernels(spark, pages):
    out = extract_features(pages, settings=ExtractionSettings()).toPandas()
    src = pages_pdf(12)
    assert len(out) == len(src)  # one image type
    merged = src.merge(out, on=["url", "warc_ts"], how="inner")
    assert len(merged) == len(src)
    s = ExtractionSettings()
    for _, r in merged.head(20).iterrows():
        vals = text_to_intensity(r["text"]).astype(float)
        fo = firstorder_features(vals, s.bin_width)
        assert r["firstorder_Mean"] == pytest.approx(fo["Mean"])
        assert r["firstorder_Entropy"] == pytest.approx(fo["Entropy"])
        gl = glcm_features(discretize(vals, 25))
        assert r["glcm_Contrast"] == pytest.approx(gl["Contrast"])
        assert r["glcm_MCC"] == pytest.approx(gl["MCC"])


def test_extract_multiple_image_types(spark, pages):
    s = ExtractionSettings(image_types=("original", "square", "logarithm"))
    out = extract_features(pages, settings=s)
    cnt = out.groupBy("image_type").count().toPandas()
    assert set(cnt["image_type"]) == {"original", "square", "logarithm"}
    assert cnt["count"].nunique() == 1


def test_extract_empty_text_yields_nan(spark):
    pdf = pd.DataFrame({
        "url": ["u1"], "warc_ts": [pd.Timestamp("2024-01-01")],
        "html": [b""], "text": [""], "lang": ["en"]})
    df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    out = extract_features(df).toPandas()
    assert out["diag_n_tokens"].iloc[0] == 0
    assert np.isnan(out["firstorder_Mean"].iloc[0])


def test_melt_features(spark, pages):
    wide = extract_features(pages.limit(2))
    long = melt_features(wide).toPandas()
    ncols = len(feature_columns(ExtractionSettings()))
    assert len(long) == 2 * ncols
    assert set(long.columns) == {"url", "warc_ts", "image_type", "feature_name", "value"}


def test_distributed_pages_generator(spark):
    df = pages_df(spark, n_urls=30, partitions=4)
    pdf = df.toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    loc = pages_pdf(30).sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert len(pdf) == len(loc)
    assert (pdf["text"] == loc["text"]).all()


def test_extraction_plan_is_shuffle_free(spark, pages):
    out = extract_features(pages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle for per-doc extraction


def test_extraction_arrow_suspect_and_null_fallback(spark):
    """The mapInArrow zero-copy path must agree with the per-doc kernels
    even when a batch contains unicode-whitespace docs (per-batch pandas
    fallback) or nulls (zero-length segments)."""
    from pyradiomics_spark.functions.text import text_to_intensity
    from pyradiomics_spark.operators.features import (_extract_one,
                                                      extract_features)

    rows = [("u1", "normal doc text here with several words"),
            ("u2", "nbsp\xa0joined words plus more"),
            ("u3", None),
            ("u4", "中文 文本 测试 ok fine")]
    df = spark.createDataFrame(rows, "url string, text string")
    st = ExtractionSettings(bin_width=1.0)
    out = extract_features(df, keys=("url",), settings=st).toPandas()
    assert len(out) == 4
    got = dict(zip(out.url, out.firstorder_Mean))
    for u, t in rows:
        feats = _extract_one(text_to_intensity(t or "").astype(float), st)
        want = feats.get("original:firstorder_Mean", float("nan"))
        if np.isnan(want):
            assert np.isnan(got[u]), u
        else:
            assert got[u] == pytest.approx(want, rel=1e-12), u


def test_matrices_arrow_matches_pandas(spark, monkeypatch):
    """extract_matrices' zero-copy mapInArrow arm must be cell-identical to
    the pandas arm, including unicode-whitespace fallback batches, null and
    empty docs."""
    import pandas as pd

    from pyradiomics_spark.operators.matrices import extract_matrices

    rows = [("u1", "aa bbb c dddd ee fff aa bbb"),
            ("u2", "nbsp\xa0joined words plus more extra tokens"),
            ("u3", None),
            ("u4", ""),
            ("u5", "中文 文本 测试 ok fine again")]
    df = spark.createDataFrame(rows, "url string, text string")
    st = ExtractionSettings(bin_width=1.0)
    key = ["url", "matrix", "i", "j", "angle"]
    a = extract_matrices(df, keys=("url",), settings=st).toPandas()
    monkeypatch.setenv("PYRS_NO_ARROW", "1")
    b = extract_matrices(df, keys=("url",), settings=st).toPandas()
    assert len(a) == len(b) and len(a) > 0
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pivot_wide_counts_and_fill(spark):
    from pyspark.sql import functions as F

    from pyradiomics_spark.operators.features import pivot_wide

    df = spark.createDataFrame(
        [("s1", "en", 10), ("s1", "en", 20), ("s1", "de", 5),
         ("s2", "en", 7)],
        ["source", "lang", "n"])
    out = pivot_wide(df, ("source",), "lang", "n",
                     values=("de", "en", "zh"), agg="sum",
                     fill_value=0, prefix="sum_")
    # conditional-agg form => ONE exchange (native pivot plans two, and
    # valueless pivot adds a hidden distinct+collect pre-job); grab the
    # plan before collect() so AQE doesn't print initial+final twice
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    got = {r.source: (r.sum_de, r.sum_en, r.sum_zh) for r in out.collect()}
    assert got == {"s1": (5, 30, 0), "s2": (0, 7, 0)}
    # out-of-domain pivot values are dropped, not smuggled in
    assert set(out.columns) == {"source", "sum_de", "sum_en", "sum_zh"}

    avg = pivot_wide(df, ("source",), "lang", "n", values=("en",),
                     agg="avg")
    assert {r.source: r.en for r in avg.collect()} == {"s1": 15.0, "s2": 7.0}

    import pytest as _pt
    with _pt.raises(ValueError, match="agg"):
        pivot_wide(df, ("source",), "lang", "n", values=("en",), agg="p99")
    with _pt.raises(ValueError, match="values"):
        pivot_wide(df, ("source",), "lang", "n", values=())
