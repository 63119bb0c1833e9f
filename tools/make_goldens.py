"""Golden-baseline generator (the analog of the reference's
tests/add_baseline.py — explicit regeneration only, never implicit).

Builds the FIXTURES.md §2 case matrix over the deterministic tiny pages
corpus, computes feature vectors DRIVER-SIDE with the pure-numpy kernels
(no Spark), and writes one parquet per case to tests/goldens/. The pytest
tier (tests/test_goldens.py) then runs the SPARK pipeline on the same cases
and asserts allclose — catching any regression in extraction, settings
plumbing, Arrow boundary, or kernels.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyradiomics_spark.config import ExtractionSettings
from pyradiomics_spark.operators.features import _extract_one, feature_columns
from pyradiomics_spark.functions.text import text_to_intensity
from pyradiomics_spark.sources.pages import pages_pdf

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens")

#: FIXTURES.md §2 case matrix (named subset of pages + settings)
CASES: dict = {
    "doc_plain": ExtractionSettings(bin_width=1.0),
    "doc_bw25": ExtractionSettings(bin_width=25.0),      # reference default W
    "doc_fbn": ExtractionSettings(bin_count=8),          # fixed bin count
    "doc_norm": ExtractionSettings(
        bin_width=0.5, normalize=True, remove_outliers=3.0),
    "doc_reseg": ExtractionSettings(
        bin_width=1.0, resegment_range=(2.0, 9.0), resegment_mode="absolute"),
    "doc_reseg_sigma": ExtractionSettings(
        bin_width=1.0, resegment_range=(-1.0, 1.0), resegment_mode="sigma"),
    "doc_multidist": ExtractionSettings(bin_width=1.0, distances=(1, 2)),
    "doc_weighted": ExtractionSettings(
        bin_width=1.0, distances=(1, 2), weighting_norm="euclidean"),
    "doc_gldm_a1": ExtractionSettings(bin_width=1.0, gldm_a=1.0),
    "doc_shift": ExtractionSettings(bin_width=1.0, voxel_array_shift=10.0),
    "doc_hashbucket": ExtractionSettings(
        bin_width=1.0, intensity_mode="hash_bucket", intensity_buckets=16),
    "doc_bpe": ExtractionSettings(bin_width=1.0, tokenizer="bpe_regex"),
    "doc_alltypes": ExtractionSettings(
        bin_width=1.0,
        image_types=("original", "square", "squareroot", "logarithm",
                     "exponential", "gradient", "wavelet-L", "wavelet-H",
                     "log-sigma-2")),
    "doc_lbp": ExtractionSettings(
        bin_width=1.0, image_types=("lbp-r1", "lbp-r2")),
    "doc_wavelet2": ExtractionSettings(
        bin_width=0.5, image_types=("wavelet-L2", "wavelet-H2")),
    "doc_db3": ExtractionSettings(
        bin_width=0.5, wavelet="db3",
        image_types=("wavelet-L", "wavelet-H")),
    "doc_coif4": ExtractionSettings(
        bin_width=0.5, wavelet="coif4",
        image_types=("wavelet-L", "wavelet-H")),
    "doc_bior22": ExtractionSettings(
        bin_width=0.5, wavelet="bior2.2",
        image_types=("wavelet-L", "wavelet-H")),
    "doc_rbio13": ExtractionSettings(
        bin_width=0.5, wavelet="rbio1.3",
        image_types=("wavelet-L", "wavelet-H")),
}

#: synthetic special documents exercising edge cases
SPECIAL_DOCS = pd.DataFrame({
    "url": ["flat://doc", "short://doc", "short2://doc", "empty://doc"],
    "warc_ts": pd.to_datetime(["2024-01-01"] * 4),
    "text": [
        "aaa aaa aaa aaa aaa aaa aaa aaa",  # flat region: 1 gray level
        "x",                                 # single token
        "ab cde",                            # two tokens
        "",                                  # empty
    ],
})


def fixture_pages() -> pd.DataFrame:
    base = pages_pdf(10)[["url", "warc_ts", "text"]]
    return pd.concat([base, SPECIAL_DOCS], ignore_index=True)


def compute_case(pages: pd.DataFrame, settings: ExtractionSettings) -> pd.DataFrame:
    fcols = feature_columns(settings)
    rows = []
    for _, r in pages.iterrows():
        vals = text_to_intensity(
            r["text"] or "", settings.tokenizer,
            settings.intensity_mode, settings.intensity_buckets).astype(np.float64)
        feats = _extract_one(vals, settings)
        for it in settings.image_types:
            rows.append(
                [r["url"], r["warc_ts"], it,
                 feats["diag_n_tokens"], feats["diag_n_valid"]]
                + [feats.get(f"{it}:{c}", float("nan")) for c in fcols])
    return pd.DataFrame(
        rows,
        columns=["url", "warc_ts", "image_type", "diag_n_tokens", "diag_n_valid"]
        + fcols)


def compute_matrices(pages: pd.DataFrame, settings: ExtractionSettings) -> pd.DataFrame:
    """Matrix-tier goldens (test_matrices.py analog): long-form matrices
    computed driver-side with the numpy kernels."""
    from pyradiomics_spark.kernels import discretize
    from pyradiomics_spark.operators.matrices import _matrix_rows

    rows = []
    for _, r in pages.iterrows():
        vals = text_to_intensity(r["text"] or "").astype(np.float64)
        if vals.size == 0:
            continue
        levels = discretize(vals, settings.bin_width, settings.bin_count)
        for m in _matrix_rows(levels, settings,
                              ("glcm", "glrlm", "glszm", "ngtdm", "gldm")):
            rows.append([r["url"], r["warc_ts"], m[0], m[1], m[2], m[3], m[4]])
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "matrix", "i", "j", "value", "angle"])


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pages = fixture_pages()
    pages.to_parquet(os.path.join(GOLDEN_DIR, "fixture_pages.parquet"), index=False)
    for case, settings in CASES.items():
        out = compute_case(pages, settings)
        out.to_parquet(os.path.join(GOLDEN_DIR, f"golden_{case}.parquet"), index=False)
        print(f"{case}: {len(out)} rows × {len(out.columns)} cols")
    mats = compute_matrices(pages, CASES["doc_plain"])
    mats.to_parquet(os.path.join(GOLDEN_DIR, "golden_matrices.parquet"), index=False)
    print(f"matrices: {len(mats)} rows")


if __name__ == "__main__":
    main()
