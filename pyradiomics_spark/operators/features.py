"""Feature-extraction operator: the Spark analog of
``RadiomicsFeatureExtractor.execute`` (/root/reference/radiomics/featureextractor.py:241-396).

Execution model
---------------
One input row = one case (url × warc_ts × its text). Because the full token
sequence lives in a single row, per-document extraction needs **no shuffle at
all**: ``mapInPandas`` streams Arrow batches through the numpy kernels —
embarrassingly parallel, scan-local, the plan is a single
WholeStageCodegen(scan) → ArrowEvalPython stage. The reference's
1-case-per-process Pool (scripts/__init__.py:393-416) maps to Spark task
parallelism over parquet splits.

Pipeline per case (order mirrors featureextractor.execute):
normalize → (resegment mask from original intensities) → per image type:
transform → per feature class: discretize → kernel features.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyradiomics_spark.config import ExtractionSettings
from pyradiomics_spark.functions.intensity import (
    apply_transform,
    normalize,
    resegment_bounds,
)
from pyradiomics_spark.functions.text import text_to_intensity
from pyradiomics_spark.kernels import (
    discretize,
    firstorder_features,
    glcm_features,
    gldm_features,
    glrlm_features,
    glszm_features,
    ngtdm_features,
)
from pyradiomics_spark.kernels.firstorder import FIRSTORDER_FEATURES
from pyradiomics_spark.kernels.glcm import GLCM_FEATURES
from pyradiomics_spark.kernels.gldm import GLDM_FEATURES
from pyradiomics_spark.kernels.glrlm import GLRLM_FEATURES
from pyradiomics_spark.kernels.glszm import GLSZM_FEATURES
from pyradiomics_spark.kernels.ngtdm import NGTDM_FEATURES
from pyradiomics_spark.kernels.seqshape import SEQSHAPE_FEATURES, seqshape_features

CLASS_FEATURES = {
    "firstorder": FIRSTORDER_FEATURES,
    "glcm": GLCM_FEATURES,
    "glrlm": GLRLM_FEATURES,
    "glszm": GLSZM_FEATURES,
    "ngtdm": NGTDM_FEATURES,
    "gldm": GLDM_FEATURES,
    "seqshape": SEQSHAPE_FEATURES,
}


def feature_columns(settings: ExtractionSettings) -> list:
    cols = []
    for cls in settings.feature_classes:
        for f in CLASS_FEATURES[cls]:
            cols.append(f"{cls}_{f}")
    return cols


def _extract_one(values: np.ndarray, settings: ExtractionSettings) -> dict:
    """All enabled features for one case. Returns {col: float} + diagnostics."""
    out: dict = {}
    np_total = int(values.size)
    out["diag_n_tokens"] = np_total

    if settings.normalize and np_total:
        values = normalize(values, settings.normalize_scale, settings.remove_outliers)

    # resegmentation: validity mask from ORIGINAL (post-normalize) intensities
    valid = np.ones(np_total, dtype=bool)
    if settings.resegment_range is not None and np_total:
        lo, hi = resegment_bounds(values, settings.resegment_range, settings.resegment_mode)
        if lo is not None:
            valid &= values >= lo
        if hi is not None:
            valid &= values <= hi
    out["diag_n_valid"] = int(valid.sum())

    fcols = feature_columns(settings)
    if out["diag_n_valid"] < max(settings.minimum_roi_size, 1):
        # reference raises on too-small ROI (imageoperations.py:292-310);
        # in a batch engine we emit NaN + keep the diagnostic
        for it in settings.image_types:
            for c in fcols:
                out[f"{it}:{c}"] = float("nan")
        return out

    # shape analog: intensity-free, computed ONCE per case, attached to the
    # 'original' image type only (the reference computes shape once on the
    # cropped original, featureextractor.py:356-360)
    if "seqshape" in settings.feature_classes:
        shape_feats = seqshape_features(np_total, valid)

    for it in settings.image_types:
        img = apply_transform(it, values, settings)
        roi = img[valid]
        # FBW gray-level-range guard (web-scale garbage docs): NaN this
        # image type instead of materializing a huge level grid
        if settings.bin_count is None and roi.size:
            est_g = (np.floor(roi.max() / settings.bin_width)
                     - np.floor(roi.min() / settings.bin_width) + 1)
            if est_g > settings.max_gray_levels:
                for c in fcols:
                    out[f"{it}:{c}"] = float("nan")
                continue
        levels = discretize(roi, settings.bin_width, settings.bin_count)
        # kernels see the compacted ROI sequence; masked positions already
        # removed — adjacency breaks are preserved by re-inserting gaps
        lv_full = np.zeros(np_total, dtype=np.int64)
        lv_full[valid] = levels
        vmask = valid

        # GLRLM and GLSZM share the identical 1-D run-length encoding —
        # compute it once per image type (common-subexpression sharing, the
        # analog of the reference's shared coefficients dict)
        rle = None
        if "glrlm" in settings.feature_classes and "glszm" in settings.feature_classes:
            from pyradiomics_spark.kernels.glrlm import run_lengths

            rle = run_lengths(lv_full, vmask)

        for cls in settings.feature_classes:
            if cls == "seqshape":
                vals_ = shape_feats if it == "original" else {
                    f: float("nan") for f in SEQSHAPE_FEATURES}
                for f, v in vals_.items():
                    out[f"{it}:seqshape_{f}"] = float(v)
                continue
            try:
                if cls == "firstorder":
                    feats = firstorder_features(
                        roi, settings.bin_width, settings.bin_count,
                        settings.voxel_array_shift, discretized=levels)
                elif cls == "glcm":
                    feats = glcm_features(
                        lv_full, settings.distances, settings.symmetrical_glcm,
                        settings.weighting_norm, vmask)
                elif cls == "glrlm":
                    feats = glrlm_features(lv_full, vmask, rle=rle)
                elif cls == "glszm":
                    feats = glszm_features(lv_full, vmask, rle=rle)
                elif cls == "ngtdm":
                    feats = ngtdm_features(lv_full, settings.distances, vmask)
                elif cls == "gldm":
                    feats = gldm_features(
                        lv_full, settings.distances, settings.gldm_a, vmask)
                else:  # pragma: no cover
                    continue
            except Exception:
                # per-feature-class failure → NaN row segment (base.py:271-273)
                feats = {f: float("nan") for f in CLASS_FEATURES[cls]}
            for f, v in feats.items():
                out[f"{it}:{cls}_{f}"] = float(v)
    return out


def _batch_fast_path(settings: ExtractionSettings) -> bool:
    """Round 2: the batched kernels cover the full validated settings
    surface (normalize, FBW/FBN, resegmentation, weighting, every image
    type). The per-doc kernels remain the ground-truth parity twin and the
    fallback for anything a future setting adds outside the envelope."""
    from pyradiomics_spark.functions.intensity import parse_image_type
    from pyradiomics_spark.kernels.batch import BATCH_TRANSFORMS, batch_supported

    return (
        batch_supported(settings)
        and all(it in BATCH_TRANSFORMS or parse_image_type(it) is not None
                for it in settings.image_types)
    )


def _extract_batch(texts, settings: ExtractionSettings, image_type: str = "original") -> dict:
    """All features of one image type for a batch of documents at once
    (kernels.batch). Returns {column: (B,) array} including diagnostics.

    Pipeline order mirrors _extract_one / featureextractor.execute:
    normalize → resegment mask (from post-normalize ORIGINAL intensities)
    → transform whole sequence → discretize ROI → kernels.
    """
    from pyradiomics_spark.kernels.batch import (
        Ragged, discretize_batch, firstorder_batch, glcm_batch,
        gldm_batch, ngtdm_batch, normalize_batch, resegment_batch,
        runs_batch_features, seqshape_batch, transform_batch)

    from pyradiomics_spark.functions.text import batch_text_to_intensity

    arrays = [
        a.astype(np.float64)
        for a in batch_text_to_intensity(
            texts, settings.tokenizer, settings.intensity_mode,
            settings.intensity_buckets)
    ]
    return _extract_from_ragged(Ragged(arrays), settings, image_type)


def _extract_from_ragged(r0, settings: ExtractionSettings,
                         image_type: str = "original") -> dict:
    """Kernel stage of _extract_batch over a prebuilt Ragged (the Arrow
    zero-copy path feeds this directly — no per-doc python arrays)."""
    from pyradiomics_spark.kernels.batch import (
        discretize_batch, firstorder_batch, glcm_batch,
        gldm_batch, ngtdm_batch, normalize_batch, resegment_batch,
        runs_batch_features, seqshape_batch, transform_batch)

    if settings.normalize and r0.x.size:
        r0 = r0.with_x(normalize_batch(
            r0, settings.normalize_scale, settings.remove_outliers))

    valid = None
    if settings.resegment_range is not None and r0.x.size:
        valid = resegment_batch(
            r0, settings.resegment_range, settings.resegment_mode)
        n_valid = np.bincount(r0.doc[valid], minlength=r0.B).astype(np.int64)
    else:
        n_valid = r0.lens.astype(np.int64)

    r = r0 if image_type == "original" else r0.with_x(
        transform_batch(r0, image_type, settings))

    # FBW gray-level-range guard (web-scale garbage docs): a single huge
    # "token" under a small bin width would make the global 1..G grid — and
    # the B×G×G texture tensors — executor-OOM-sized. Flag such docs, mask
    # their positions out of every kernel, and NaN their features for this
    # image type (mirrors the per-doc path).
    over_cap = np.zeros(r0.B, dtype=bool)
    if settings.bin_count is None and r.x.size:
        fl = np.floor(r.x / settings.bin_width)
        if valid is None:
            fmn, fmx = r.segmin(fl), r.segmax(fl)
        else:
            fmn = r.segmin(np.where(valid, fl, np.inf))
            fmx = r.segmax(np.where(valid, fl, -np.inf))
        with np.errstate(invalid="ignore"):
            over_cap = (fmx - fmn + 1) > settings.max_gray_levels
        over_cap &= np.asarray(n_valid) > 0
        if over_cap.any():
            drop = over_cap[r.doc]
            valid = ~drop if valid is None else (valid & ~drop)

    rv = r if valid is None else r.masked(valid)
    levels_v = discretize_batch(rv, settings.bin_width, settings.bin_count)
    if valid is None:
        levels_full = levels_v
    else:
        levels_full = np.zeros(r.x.size, dtype=np.int64)
        levels_full[valid] = levels_v

    cols: dict = {
        "diag_n_tokens": r.lens.astype(np.int64),
        "diag_n_valid": n_valid,
    }
    want = set(settings.feature_classes)
    if "firstorder" in want:
        for f, v in firstorder_batch(rv, levels_v, settings.voxel_array_shift).items():
            cols[f"firstorder_{f}"] = v
    if "glcm" in want:
        for f, v in glcm_batch(r, levels_full, settings.distances,
                               settings.symmetrical_glcm,
                               settings.weighting_norm, valid).items():
            cols[f"glcm_{f}"] = v
    if "glrlm" in want or "glszm" in want:
        rl, sz = runs_batch_features(r, levels_full, valid)
        if "glrlm" in want:
            for f, v in rl.items():
                cols[f"glrlm_{f}"] = v
        if "glszm" in want:
            for f, v in sz.items():
                cols[f"glszm_{f}"] = v
    if "ngtdm" in want:
        for f, v in ngtdm_batch(r, levels_full, settings.distances, valid).items():
            cols[f"ngtdm_{f}"] = v
    if "gldm" in want:
        for f, v in gldm_batch(r, levels_full, settings.gldm_a,
                               settings.distances, valid).items():
            cols[f"gldm_{f}"] = v
    if "seqshape" in want and image_type != "original":
        # shape analog is emitted only on the original image type
        for f in SEQSHAPE_FEATURES:
            cols[f"seqshape_{f}"] = np.full(r.B, np.nan)
    elif "seqshape" in want:
        for f, v in seqshape_batch(r0, valid).items():
            cols[f"seqshape_{f}"] = v

    # per-doc semantics: ROI below minimum size (whole row) or over the
    # gray-level cap (this image type) → NaN features
    nan_docs = (n_valid < max(settings.minimum_roi_size, 1)) | over_cap
    if nan_docs.any():
        for c, v in cols.items():
            if c.startswith("diag_"):
                continue
            v = np.asarray(v, dtype=np.float64).copy()
            v[nan_docs] = np.nan
            cols[c] = v
    return cols


def extraction_schema(df: DataFrame, keys: Iterable, settings: ExtractionSettings) -> str:
    key_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    parts = [f"`{k}` {key_fields[k]}" for k in keys]
    parts += ["image_type string", "diag_n_tokens int", "diag_n_valid int"]
    parts += [f"`{c}` double" for c in feature_columns(settings)]
    return ", ".join(parts)


def extract_features(
    df: DataFrame,
    keys: tuple = ("url", "warc_ts"),
    text_col: str = "text",
    settings: ExtractionSettings | None = None,
) -> DataFrame:
    """Wide feature table: one output row per input row per image type.

    Shuffle-free: pure mapInPandas over the scan. Column pruning matters —
    we select only keys + text before the Arrow boundary.
    """
    if settings is None:
        settings = ExtractionSettings()
    keys = tuple(keys)
    cols = list(keys) + [text_col]
    src = df.select(*cols)
    # kernel-bound stage: if the scan has fewer splits than the cluster has
    # slots (tiny files / single parquet row group), fan out first — one
    # cheap shuffle of (keys, text) buys full task parallelism. Big inputs
    # (many splits) skip this.
    if not df.isStreaming:  # streams parallelize per micro-batch source split
        spark = df.sparkSession
        slots = spark.sparkContext.defaultParallelism
        # exact split-count check: file COUNT is not a safe proxy (Spark's
        # split packing — maxPartitionBytes/openCostInBytes — can coalesce
        # thousands of tiny files into a handful of partitions, and
        # skipping the repartition there silently serializes the kernel
        # stage). The src.rdd conversion is one bounded driver-side plan
        # walk per extract_features call — correctness over that cost.
        if src.rdd.getNumPartitions() < slots:
            # 1×slots measured fastest for the batched kernel (bigger
            # batches amortize; AQE handles stragglers at real scale)
            src = src.repartition(slots)
    schema = extraction_schema(df, keys, settings)
    fcols = feature_columns(settings)
    image_types = settings.image_types

    out_cols = list(keys) + ["image_type", "diag_n_tokens", "diag_n_valid"] + fcols
    fast = _batch_fast_path(settings)
    # zero-copy Arrow path: the string column's value buffer IS the
    # concatenated UTF-8 corpus the byte tokenizer wants — mapInArrow skips
    # the Arrow→pandas python-string materialization entirely (the largest
    # non-kernel cost of the extraction stage). Falls back to the pandas
    # path per batch when a unicode-whitespace suspect is present, and
    # wholesale for non-default tokenizer/intensity settings.
    use_arrow = (fast and settings.tokenizer == "whitespace"
                 and settings.intensity_mode == "token_len"
                 and not os.environ.get("PYRS_NO_ARROW"))

    def _pandas_frames(pdf: pd.DataFrame):
        frames = []
        texts = pdf[text_col].tolist()
        for it in image_types:
            cols = _extract_batch(texts, settings, image_type=it)
            data = {k: pdf[k].to_numpy() for k in keys}
            data["image_type"] = it
            data["diag_n_tokens"] = cols["diag_n_tokens"]
            data["diag_n_valid"] = cols["diag_n_valid"]
            for c in fcols:
                data[c] = cols.get(c, np.nan)
            frames.append(pd.DataFrame(data, columns=out_cols))
        return frames

    def run_arrow(batches):
        import pyarrow as pa

        from pyradiomics_spark.functions.text import arrow_token_lens
        from pyradiomics_spark.kernels.batch import Ragged

        out_schema = None
        for rb in batches:
            if out_schema is None:
                names = [f.name for f in rb.schema]
                ti = names.index(text_col)
                key_idx = [names.index(k) for k in keys]
                out_schema = pa.schema(
                    [(k, rb.schema.field(k).type) for k in keys]
                    + [("image_type", pa.string()),
                       ("diag_n_tokens", pa.int32()),
                       ("diag_n_valid", pa.int32())]
                    + [(c, pa.float64()) for c in fcols])
            parsed = arrow_token_lens(rb.column(ti))
            if parsed is None:  # unicode-ws suspect in batch → pandas path
                for f in _pandas_frames(rb.to_pandas()):
                    yield pa.RecordBatch.from_pandas(
                        f, schema=out_schema, preserve_index=False)
                continue
            tok_len, counts = parsed
            r0 = Ragged.from_concat(tok_len.astype(np.float64), counts)
            n = rb.num_rows
            for it in image_types:
                cols = _extract_from_ragged(r0, settings, image_type=it)
                arrays = [rb.column(i) for i in key_idx]
                arrays.append(pa.array([it] * n, type=pa.string()))
                arrays.append(pa.array(
                    np.asarray(cols["diag_n_tokens"], dtype=np.int32)))
                arrays.append(pa.array(
                    np.asarray(cols["diag_n_valid"], dtype=np.int32)))
                for c in fcols:
                    v = cols.get(c)
                    if v is None:
                        arrays.append(pa.array(np.full(n, np.nan)))
                    else:
                        arrays.append(pa.array(
                            np.asarray(v, dtype=np.float64)))
                yield pa.RecordBatch.from_arrays(arrays, names=out_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fast:
                # one dict → one DataFrame per image type (no column-by-
                # column inserts: avoids pandas block fragmentation churn)
                frames = _pandas_frames(pdf)
                yield frames[0] if len(frames) == 1 else pd.concat(
                    frames, ignore_index=True)
                continue
            rows = []
            for tup in pdf.itertuples(index=False):
                keyvals = tup[: len(keys)]
                text = tup[len(keys)]
                vals = text_to_intensity(
                    text or "", settings.tokenizer,
                    settings.intensity_mode, settings.intensity_buckets,
                ).astype(np.float64)
                feats = _extract_one(vals, settings)
                for it in image_types:
                    row = list(keyvals) + [
                        it, feats["diag_n_tokens"], feats["diag_n_valid"]]
                    row += [feats.get(f"{it}:{c}", float("nan")) for c in fcols]
                    rows.append(row)
            yield pd.DataFrame(rows, columns=out_cols)

    if use_arrow:
        return src.mapInArrow(run_arrow, schema=schema)
    return src.mapInPandas(run, schema=schema)


def pivot_wide(
    df: DataFrame,
    keys: tuple,
    pivot_col: str,
    value_col: str,
    values: tuple,
    agg: str = "sum",
    fill_value=None,
    prefix: str = "",
) -> DataFrame:
    """Long → wide (the inverse of ``melt_features``): one output column
    per entry of ``values``, aggregating ``value_col`` with ``agg``
    (sum/count/avg/min/max) per ``keys`` group — the feature-table
    assembly step after long-form extraction.

    ``values`` is REQUIRED: an explicit domain compiles to conditional
    aggregation — ONE map-side-combined hash aggregate whose partial rows
    carry the |values|-wide vector. That beats both alternatives:
    ``DataFrame.pivot`` without values runs a hidden distinct+collect
    pre-job over the pivot column (driver OOM on an unbounded domain),
    and even WITH values Spark plans pivot as two chained aggregates —
    (keys, pivot) then pivotfirst(keys) — i.e. two shuffles where this
    needs one. Unseen combinations yield null (or ``fill_value``);
    pivot-column values outside ``values`` are dropped, so the domain
    must come from config, not hope."""
    aggs = {"sum": F.sum, "count": F.count, "avg": F.avg,
            "min": F.min, "max": F.max}
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    if not values:
        raise ValueError("values must be a non-empty explicit domain")
    cols = [
        aggs[agg](
            F.when(F.col(pivot_col) == F.lit(v), F.col(value_col))
        ).alias(f"{prefix}{v}")
        for v in values
    ]
    out = df.groupBy(*[F.col(k) for k in keys]).agg(*cols)
    if fill_value is not None:
        out = out.fillna(fill_value, [f"{prefix}{v}" for v in values])
    return out


def melt_features(wide: DataFrame, keys: tuple = ("url", "warc_ts")) -> DataFrame:
    """Wide → long (key..., image_type, feature_name, value) via builtin
    ``stack`` — stays JVM-side, no UDF."""
    fcols = [c for c in wide.columns
             if c not in keys and c not in ("image_type", "diag_n_tokens", "diag_n_valid")]
    n = len(fcols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in fcols)
    expr = f"stack({n}, {pairs}) as (feature_name, value)"
    return wide.selectExpr(*[f"`{k}`" for k in keys], "image_type", expr)
