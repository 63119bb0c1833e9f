"""Snapshot diff — row-level change detection between two crawls of the
same keyed table: (key, status ∈ {added, removed, changed}) plus the
content fingerprints that justified the verdict. The data-engineering
staple behind incremental recompute (only 'changed'/'added' keys re-enter
the feature pipeline; 'removed' keys tombstone downstream tables) and the
crawl-over-crawl audit (how much of the web moved this week).

Reference scope note: pyradiomics has no multi-snapshot notion (one image
per run); this extends the engine's temporal family (snapshot_drift
compares vocabularies; THIS compares rows) for the recurring-crawl
pipeline the north rule targets.

Scale shape: ONE full-outer equi-join on the key — both sides reduced to
(key, md5(content)) projections BEFORE the join, so the shuffle carries
two thin columns, never document bodies; unchanged rows are filtered out
post-join (the overwhelming majority at crawl cadence, but they never
shuffle more than the fingerprint). No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """(key, status, old_fp, new_fp): 'added' (key only in ``new``),
    'removed' (only in ``old``), 'changed' (both, fingerprint differs).
    Unchanged keys are omitted. The fingerprint is md5 over the
    ``compare_cols`` rendered with explicit NULL sentinels (concat_ws
    silently drops NULLs, which would alias (NULL,'x') with ('x',)); the
    sentinel byte is \\x01, not \\x00, because engines that reject NUL
    inside strings (DuckDB) must be able to replay the fingerprint."""
    def fp(df):
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x01null"))
                 for c in compare_cols]
        return df.select(
            F.col(key_col).alias("key"),
            F.md5(F.concat_ws("\x1f", *parts)).alias("fp"))

    o = fp(old).withColumnRenamed("fp", "old_fp")
    n = fp(new).withColumnRenamed("fp", "new_fp")
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed")))
    return (j.withColumn("status", status)
            .where(F.col("status").isNotNull())
            .select("key", "status", "old_fp", "new_fp"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) census of a snapshot_diff output — the crawl-health
    metric row (map-side-combined groupBy on ≤3 statuses)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))
