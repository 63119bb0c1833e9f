"""The correctness triangle: full texture features computed THREE ways —
numpy kernel (applyInPandas path) ↔ pure-relational Spark (window/groupBy)
↔ DuckDB oracle (driver gate). Here we close the kernel↔relational edge;
check_oracle closes relational↔DuckDB."""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from pyradiomics_spark.functions.text import text_to_intensity
from pyradiomics_spark.kernels import (
    discretize, glcm_features, glrlm_features, ngtdm_features)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]


def _kernel_per_doc(docs_pdf, fn, feature):
    out = {}
    for _, r in docs_pdf.iterrows():
        vals = text_to_intensity(r["text"]).astype(float)
        if vals.size == 0:
            continue
        levels = discretize(vals, bin_width=1.0)
        out[r["doc_id"]] = fn(levels)[feature]
    return out


def test_relational_glcm_contrast_matches_kernel(spark, docs_pdf):
    rel = entrymod.q_glcm_contrast_doc(spark, SF_DIR).toPandas()
    kern = _kernel_per_doc(
        docs_pdf, lambda lv: glcm_features(lv, distances=(1,), symmetric=True),
        "Contrast")
    got = dict(zip(rel.doc_id, rel.glcm_contrast))
    assert len(got) > 100
    for doc_id, v in list(kern.items()):
        if np.isnan(v):
            continue
        assert got[doc_id] == pytest.approx(v, abs=1e-6), doc_id


def test_relational_glrlm_sre_matches_kernel(spark, docs_pdf):
    rel = entrymod.q_glrlm_sre_doc(spark, SF_DIR).toPandas()
    kern = _kernel_per_doc(docs_pdf, glrlm_features, "ShortRunEmphasis")
    got = dict(zip(rel.doc_id, rel.glrlm_sre))
    for doc_id, v in list(kern.items()):
        assert got[doc_id] == pytest.approx(v, abs=1e-6), doc_id


def test_relational_ngtdm_coarseness_matches_kernel(spark, docs_pdf):
    rel = entrymod.q_ngtdm_coarseness_doc(spark, SF_DIR).toPandas()
    kern = _kernel_per_doc(
        docs_pdf, lambda lv: ngtdm_features(lv, distances=(1,)), "Coarseness")
    got = dict(zip(rel.doc_id, rel.ngtdm_coarseness))
    for doc_id, v in list(kern.items()):
        # query rounds to 6 dp → absolute tolerance (values can be 1e6 flat)
        assert got[doc_id] == pytest.approx(v, abs=1e-6, rel=1e-9), doc_id


def test_relational_glszm_zp_matches_kernel(spark, docs_pdf):
    from pyradiomics_spark.kernels import glszm_features

    rel = entrymod.q_glszm_zp_doc(spark, SF_DIR).toPandas()
    kern = _kernel_per_doc(docs_pdf, glszm_features, "ZonePercentage")
    got = dict(zip(rel.doc_id, rel.glszm_zone_percentage))
    for doc_id, v in kern.items():
        assert got[doc_id] == pytest.approx(v, abs=1e-6), doc_id


def test_relational_gldm_sde_matches_kernel(spark, docs_pdf):
    from pyradiomics_spark.kernels import gldm_features

    rel = entrymod.q_gldm_sde_doc(spark, SF_DIR).toPandas()
    kern = _kernel_per_doc(
        docs_pdf, lambda lv: gldm_features(lv, distances=(1,), alpha=0.0),
        "SmallDependenceEmphasis")
    got = dict(zip(rel.doc_id, rel.gldm_sde))
    for doc_id, v in kern.items():
        assert got[doc_id] == pytest.approx(v, abs=1e-6), doc_id


def test_relational_glcm_imc_matches_kernel(spark, docs_pdf):
    """Imc1/Imc2 close the last goldens-only feature-math gap: the
    closed-form entropy combinations (HXY/HXY1/HXY2, glcm.py:555-647)
    verified kernel ↔ relational (check_oracle closes relational ↔ DuckDB)."""
    rel = entrymod.q_glcm_imc_doc(spark, SF_DIR).toPandas()
    kern1 = _kernel_per_doc(
        docs_pdf, lambda lv: glcm_features(lv, distances=(1,), symmetric=True),
        "Imc1")
    kern2 = _kernel_per_doc(
        docs_pdf, lambda lv: glcm_features(lv, distances=(1,), symmetric=True),
        "Imc2")
    got1 = dict(zip(rel.doc_id, rel.glcm_imc1))
    got2 = dict(zip(rel.doc_id, rel.glcm_imc2))
    assert len(got1) > 100
    for doc_id, v in kern1.items():
        if np.isnan(v):
            continue
        assert got1[doc_id] == pytest.approx(v, abs=2e-6), ("imc1", doc_id)
    for doc_id, v in kern2.items():
        if np.isnan(v):
            continue
        assert got2[doc_id] == pytest.approx(v, abs=2e-6), ("imc2", doc_id)
