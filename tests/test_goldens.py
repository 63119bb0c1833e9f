"""Golden end-to-end regression (the analog of the reference's
tests/test_features.py golden-CSV tier): run the SPARK extraction pipeline
on the committed fixture corpus under every settings variant and assert
allclose against the committed driver-side goldens.

Goldens are regenerated ONLY explicitly via tools/make_goldens.py
(the discipline of /root/reference/tests/add_baseline.py).
"""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _cases():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_goldens import CASES
    return CASES


CASES = _cases()


@pytest.fixture(scope="module")
def fixture_df(spark):
    pdf = pd.read_parquet(os.path.join(GOLDEN_DIR, "fixture_pages.parquet"))
    return spark.createDataFrame(pdf).cache()


@pytest.mark.parametrize("case", sorted(CASES.keys()))
def test_spark_matches_golden(spark, fixture_df, case):
    from pyradiomics_spark.operators.features import extract_features

    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, f"golden_{case}.parquet"))
    got = extract_features(
        fixture_df, keys=("url", "warc_ts"), settings=CASES[case]
    ).toPandas()

    key = ["url", "warc_ts", "image_type"]
    g = golden.sort_values(key).reset_index(drop=True)
    o = got[golden.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(o)
    pd.testing.assert_frame_equal(o[key], g[key])

    num_cols = [c for c in golden.columns if c not in key]
    gv = g[num_cols].to_numpy(dtype=float)
    ov = o[num_cols].to_numpy(dtype=float)
    both_nan = np.isnan(gv) & np.isnan(ov)
    close = np.isclose(gv, ov, rtol=1e-9, atol=1e-12) | both_nan
    if not close.all():
        bad = np.argwhere(~close)[:5]
        msgs = [
            f"row {r} col {num_cols[c]}: golden={gv[r, c]!r} got={ov[r, c]!r}"
            for r, c in bad
        ]
        raise AssertionError(f"{case}: {len(np.argwhere(~close))} mismatches; " +
                             "; ".join(msgs))


def test_goldens_cover_edge_docs():
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, "golden_doc_plain.parquet"))
    flat = golden[golden.url == "flat://doc"].iloc[0]
    # flat-region fixups: Correlation→1, MCC→1, Coarseness→1e6, skew/kurt→0
    assert flat["glcm_Correlation"] == 1.0
    assert flat["glcm_MCC"] == 1.0
    assert flat["ngtdm_Coarseness"] == 1e6
    assert flat["firstorder_Skewness"] == 0.0
    empty = golden[golden.url == "empty://doc"].iloc[0]
    assert np.isnan(empty["firstorder_Mean"])
    single = golden[golden.url == "short://doc"].iloc[0]
    assert single["diag_n_tokens"] == 1
    assert single["firstorder_Variance"] == 0.0


def test_spark_matrices_match_golden(spark, fixture_df):
    """Matrix-tier golden (the test_matrices.py analog, tolerance 1e-3 per
    BASELINE.md row 2; ours are exact)."""
    from pyradiomics_spark.operators.matrices import extract_matrices

    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, "golden_matrices.parquet"))
    got = extract_matrices(
        fixture_df, keys=("url", "warc_ts"), settings=CASES["doc_plain"]
    ).toPandas()
    key = ["url", "warc_ts", "matrix", "i", "j", "angle"]
    golden["angle"] = golden["angle"].astype("int64")
    got["angle"] = got["angle"].astype("int64")
    g = golden.sort_values(key).reset_index(drop=True)
    o = got[golden.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(o)
    pd.testing.assert_frame_equal(o[key], g[key])
    assert np.abs(o["value"].to_numpy() - g["value"].to_numpy()).max() < 1e-3
