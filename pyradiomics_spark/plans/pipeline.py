"""Config-driven extraction pipeline — the engine-level analog of
``RadiomicsFeatureExtractor`` (/root/reference/radiomics/featureextractor.py:79-239):
construct from settings (dict / YAML file), then ``run`` over a pages table.

Adds the north-rule composition the reference never had:
``run_with_cuts`` = extract per snapshot → **as-of join** the feature vectors
onto arbitrary cut timestamps per entity (zero leakage), and
``run_resumable`` = checkpointed execution that a killed job resumes exactly.

YAML schema mirrors the reference parameter-file shape
(featureextractor.py:165-186): top-level ``setting:``, ``imageType:``,
``featureClass:`` keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyradiomics_spark.config import ALL_FEATURE_CLASSES, ExtractionSettings
from pyradiomics_spark.operators.features import extract_features

#: reference-style YAML setting names → our dataclass fields
_SETTING_MAP = {
    "binWidth": "bin_width",
    "binCount": "bin_count",
    "distances": "distances",
    "symmetricalGLCM": "symmetrical_glcm",
    "weightingNorm": "weighting_norm",
    "gldm_a": "gldm_a",
    "voxelArrayShift": "voxel_array_shift",
    "normalize": "normalize",
    "normalizeScale": "normalize_scale",
    "removeOutliers": "remove_outliers",
    "resegmentRange": "resegment_range",
    "resegmentMode": "resegment_mode",
    "minimumROISize": "minimum_roi_size",
    "tokenizer": "tokenizer",
    "intensityMode": "intensity_mode",
    "intensityBuckets": "intensity_buckets",
    # convolutional-filter settings (paramSchema.yaml names)
    "wavelet": "wavelet",
    "startLevel": "wavelet_start_level",
}


def settings_from_params(params: dict) -> ExtractionSettings:
    """Build settings from a reference-style params dict
    (``setting:``/``imageType:``/``featureClass:`` layout)."""
    kw = {}
    for yaml_key, field in _SETTING_MAP.items():
        if yaml_key in params.get("setting", {}):
            v = params["setting"][yaml_key]
            if isinstance(v, list):
                v = tuple(v)
            kw[field] = v
    if "imageType" in params:
        kw["image_types"] = tuple(params["imageType"].keys())
    if "featureClass" in params:
        enabled = tuple(k for k in params["featureClass"] if k in ALL_FEATURE_CLASSES)
        if enabled:
            kw["feature_classes"] = enabled
    return ExtractionSettings(**kw)


def settings_from_yaml(path: str) -> ExtractionSettings:
    """Load a YAML parameter file (pyyaml if present, else a minimal parser
    for the flat 2-level subset our schema uses)."""
    try:
        import yaml  # type: ignore

        with open(path) as f:
            params = yaml.safe_load(f) or {}
    except ImportError:
        params = _mini_yaml(path)
    return settings_from_params(params)


def _mini_yaml(path: str) -> dict:
    """Tiny indentation-based parser for ``key:``/``  key: value`` files."""
    root: dict = {}
    stack = [root]
    with open(path) as f:
        for raw in f:
            line = raw.split("#")[0].rstrip()
            if not line.strip():
                continue
            indent = len(line) - len(line.lstrip())
            key, _, val = line.strip().partition(":")
            val = val.strip()
            depth = indent // 2
            while len(stack) > depth + 1:
                stack.pop()
            if not val:
                d: dict = {}
                stack[-1][key] = d
                stack.append(d)
            else:
                if val.startswith("["):
                    items = [x.strip() for x in val.strip("[]").split(",") if x.strip()]
                    parsed = [_scalar(x) for x in items]
                    stack[-1][key] = parsed
                else:
                    stack[-1][key] = _scalar(val)
    return root


def _scalar(s: str):
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "~", "none"):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s.strip("'\"")


class FeaturePipeline:
    """Reusable configured pipeline over pages-shaped tables."""

    def __init__(self, settings: ExtractionSettings | None = None):
        self.settings = settings or ExtractionSettings()

    @classmethod
    def from_yaml(cls, path: str) -> "FeaturePipeline":
        return cls(settings_from_yaml(path))

    @classmethod
    def from_params(cls, params: dict) -> "FeaturePipeline":
        return cls(settings_from_params(params))

    def run(
        self, df: DataFrame, keys=("url", "warc_ts"), text_col: str = "text"
    ) -> DataFrame:
        # raw-crawl tables may carry only html: run the byte-identical
        # extraction stage first (featureextractor loadImage analog)
        if text_col not in df.columns and "html" in df.columns:
            from pyradiomics_spark.functions.text import with_extracted_text

            df = with_extracted_text(df, html_col="html", out_col=text_col)
        return extract_features(df, tuple(keys), text_col, self.settings)

    def run_resumable(
        self,
        df: DataFrame,
        checkpoint_path: str,
        keys=("url", "warc_ts"),
        text_col: str = "text",
        ts_col: str | None = None,
    ) -> DataFrame:
        """Checkpointed run: only keys missing from the checkpoint are
        extracted; rerun after a kill converges to the same table."""
        from pyradiomics_spark.sources.sinks import resume_transform

        keys = tuple(keys)
        return resume_transform(
            df,
            list(keys),
            checkpoint_path,
            lambda part: extract_features(part, keys, text_col, self.settings),
            ts_col=ts_col,
        )

    def run_with_cuts(
        self,
        pages: DataFrame,
        cuts: DataFrame,
        entity_col: str = "url",
        ts_col: str = "warc_ts",
        cut_ts_col: str = "cut_ts",
        text_col: str = "text",
    ) -> DataFrame:
        """Point-in-time feature serving: extract per snapshot, then attach
        to every (entity, cut_ts) row the latest feature vector with
        snapshot ts ≤ cut_ts (as-of; zero leakage)."""
        from pyradiomics_spark.operators.asof import asof_join

        feats = self.run(pages, keys=(entity_col, ts_col), text_col=text_col)
        return asof_join(
            cuts, feats, on=entity_col, left_ts=cut_ts_col, right_ts=ts_col
        )
