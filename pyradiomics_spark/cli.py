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

    if args.checkpoint:
        out = pipe.run_resumable(df, args.checkpoint, keys, args.text_col)
        out.write.mode("overwrite").parquet(args.output)
    else:
        pipe.run(df, keys, args.text_col).write.mode("overwrite").parquet(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
