"""North-rule invariant: byte-identical extracted text per url, pinned at
the Spark level — the pandas-UDF extraction of html must reproduce the
ground-truth text column exactly, across partitionings and repeated runs."""

from pyspark.sql import functions as F

from pyradiomics_spark.functions.text import with_extracted_text
from pyradiomics_spark.sources.pages import pages_pdf, PAGES_SCHEMA


def test_extraction_byte_identical(spark):
    pages = spark.createDataFrame(pages_pdf(20), schema=PAGES_SCHEMA)
    out = with_extracted_text(
        pages.drop("text"), html_col="html", out_col="text_re")
    joined = out.join(
        pages.select("url", "warc_ts", "text"), ["url", "warc_ts"])
    mism = joined.where(
        F.sha2(F.col("text_re").cast("binary"), 256)
        != F.sha2(F.col("text").cast("binary"), 256)).count()
    assert mism == 0


def test_extraction_partitioning_invariant(spark):
    pages = spark.createDataFrame(pages_pdf(10), schema=PAGES_SCHEMA)
    a = with_extracted_text(pages.repartition(1).drop("text")).select(
        "url", "warc_ts", F.sha2(F.col("text").cast("binary"), 256).alias("h"))
    b = with_extracted_text(pages.repartition(16).drop("text")).select(
        "url", "warc_ts", F.sha2(F.col("text").cast("binary"), 256).alias("h"))
    diff = a.join(b, ["url", "warc_ts"]).where(a["h"] != b["h"]).count()
    assert diff == 0
    plan = with_extracted_text(pages.drop("text"))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time Python
