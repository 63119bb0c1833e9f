"""spark-submit entry point.

Usage:
    spark-submit --py-files pyradiomics_spark.zip -m pyradiomics_spark.cli \\
        --input /path/pages_parquet --output /path/features \\
        [--params params.yaml] [--checkpoint /path/ckpt] \\
        [--keys url,warc_ts] [--text-col text]

The analog of the reference's ``pyradiomics`` console script
(/root/reference/radiomics/scripts/__init__.py:690-696) — batch input table
in, feature table out, optional YAML params, resumable via checkpoint.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pyradiomics-spark")
    p.add_argument("--input", required=True, help="input parquet/Iceberg path")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--params", help="YAML parameter file")
    p.add_argument("--checkpoint", help="checkpoint path for exact resume")
    p.add_argument("--keys", default="url,warc_ts")
    p.add_argument("--text-col", default="text")
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] cores (ignored under a real cluster master)")
    p.add_argument("--mode", choices=("segment", "voxel", "curate"),
                   default="segment",
                   help="segment = one feature row per case (default); "
                        "voxel = per-position feature maps "
                        "(the reference's --mode voxel analog); "
                        "curate = the training-data curation pipeline "
                        "(dedup → components → quality → split → pack), "
                        "committing train_packed/ + holdout_ids/ under "
                        "--output and printing the metrics dict as JSON")
    p.add_argument("--radius", type=int, default=2,
                   help="voxel-mode kernel radius (kernelRadius analog)")
    p.add_argument("--pack-budget", type=int, default=2048,
                   help="curate-mode context-window token budget")
    p.add_argument("--min-quality", type=float, default=0.3,
                   help="curate-mode quality-score floor")
    p.add_argument("--skip-nans", action="store_true",
                   help="emit long format (url, ts, feature, value) with "
                        "NaN features dropped — the reference CLI's "
                        "--skip-nans (scripts/__init__.py:470-477)")
    p.add_argument("--format", choices=("parquet", "csv", "json"),
                   default="parquet",
                   help="output format (reference CLI writes csv/json/txt)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from pyradiomics_spark.plans.pipeline import FeaturePipeline

    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing  # under spark-submit the session is cluster-managed
    else:
        from pyradiomics_spark.session import get_spark

        spark = get_spark(app_name="pyradiomics-spark-cli", cores=args.cores)

    pipe = (
        FeaturePipeline.from_yaml(args.params) if args.params else FeaturePipeline()
    )
    df = spark.read.parquet(args.input)
    keys = tuple(args.keys.split(","))

    def write(out):
        if args.skip_nans:
            from pyspark.sql import functions as F

            from pyradiomics_spark.operators.features import melt_features

            mkeys = keys + ("pos",) if "pos" in out.columns else keys
            out = melt_features(out, keys=mkeys).where(
                F.col("value").isNotNull() & ~F.isnan("value"))
        w = out.write.mode("overwrite")
        if args.format == "csv":
            w.option("header", True).csv(args.output)
        elif args.format == "json":
            w.json(args.output)
        else:
            w.parquet(args.output)

    if args.mode == "curate":
        if args.checkpoint:
            p.error("--checkpoint is not supported with --mode curate "
                    "(the pipeline commits its own outputs atomically)")
        import json

        from pyradiomics_spark.plans.curation import curate

        metrics = curate(
            df, id_col=keys[0], text_col=args.text_col,
            min_quality=args.min_quality, pack_budget=args.pack_budget,
            out_path=args.output)
        print(json.dumps(metrics))
        return 0
    if args.mode == "voxel":
        if args.checkpoint:
            p.error("--checkpoint is not supported with --mode voxel "
                    "(voxel maps have no per-case resume ledger yet)")
        from pyradiomics_spark.operators.voxel import voxel_feature_maps

        out = voxel_feature_maps(
            df, keys=keys, text_col=args.text_col, radius=args.radius,
            settings=pipe.settings)
        write(out)
    elif args.checkpoint:
        out = pipe.run_resumable(df, args.checkpoint, keys, args.text_col)
        write(out)
    else:
        write(pipe.run(df, keys, args.text_col))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
