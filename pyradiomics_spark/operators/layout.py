"""Data-layout optimization for the 100 TB read path — Z-order
(Morton) clustering keys, the lakehouse OPTIMIZE ZORDER primitive:
co-locate rows that are close in SEVERAL columns so multi-predicate
scans prune most files (a single-column sort only prunes its leading
column; bit-interleaving gives every listed column partial locality).

Reference scope note: pyradiomics never lays out data; this serves the
engine's own parquet/bucketed write path (sources/sinks.py) the way
Delta/Iceberg table optimizers serve theirs.

Scale shape: quantile cuts per column come from ONE exact-percentile
aggregate broadcast back (the psi_drift/winsorize pattern — GK-sketch
arm available upstream for 10^12 rows), bucket assignment + bit
interleave are scan-fused integer expressions, and the write is
repartitionByRange on the z-key (Spark samples the key — one extra pass
— then range-shuffles once) + sortWithinPartitions. Expression cost is
O(2^bits) comparisons per column: bits=4..6 is the useful range (16-64
buckets per dimension bounds file-level clustering already; file
pruning works at file granularity, not row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols,
    bits: int = 4,
    out_col: str = "zorder",
    round_dp: int | None = 6,
) -> DataFrame:
    """Append the Morton key: each column quantile-bucketed into 2^bits
    levels (baseline = the frame itself; edges 6-dp floor-rounded so the
    assignment is engine-reproducible), bit-planes interleaved
    column-major (col i contributes bit b to position b·n_cols + i).
    Null column values bucket to 0 (lowest locality cell)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    if not 1 <= bits <= 10:
        raise ValueError("bits must be in [1, 10]")
    n_levels = 2 ** bits
    edge_exprs = []
    for ci, c in enumerate(cols):
        for k in range(1, n_levels):
            e = F.percentile(F.col(c).cast("double"),
                             F.lit(k / n_levels))
            if round_dp is not None:
                scale = float(10 ** round_dp)
                e = F.floor(e * scale + F.lit(0.5 + 2.0 ** -20)) / scale
            edge_exprs.append(e.alias(f"__z{ci}_{k}"))
    edges = F.broadcast(df.agg(*edge_exprs))
    j = df.crossJoin(edges)
    z: Column = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        bucket: Column = F.lit(0)
        for k in range(1, n_levels):
            bucket = bucket + F.when(
                F.col(c).cast("double") > F.col(f"__z{ci}_{k}"),
                1).otherwise(0)
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket.cast("long"), b)
                .bitwiseAND(F.lit(1)), b * len(cols) + ci)
    drop = [f"__z{ci}_{k}" for ci in range(len(cols))
            for k in range(1, n_levels)]
    return j.withColumn(out_col, z).drop(*drop)


def zorder_repartition(
    df: DataFrame,
    cols,
    bits: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + locally sort by the Morton key — the layout to
    write before multi-predicate scan workloads. One range shuffle (plus
    Spark's internal sampling pass over the key); downstream writers
    inherit one file per partition with tight min/max stats on EVERY
    z-ordered column."""
    keyed = zorder_key(df, cols, bits)
    parts = num_partitions or df.sparkSession.sparkContext \
        .defaultParallelism
    return (keyed.repartitionByRange(parts, F.col("zorder"))
            .sortWithinPartitions("zorder"))


def minmax_index(
    df: DataFrame,
    bucket_col,
    stat_cols: list[str],
) -> DataFrame:
    """Per-bucket column statistics — (bucket, column, min_v, max_v,
    n_rows, n_nulls) in long form, values rendered as strings so one
    table indexes heterogeneous column types. This is the file-skipping
    manifest an Iceberg/Delta writer keeps per data file: a reader
    prunes every bucket whose [min, max] for a predicate column misses
    the filter range, the mechanism that makes `zorder_repartition`
    pay off (clustered buckets ⇒ tight ranges ⇒ deep pruning).

    Scale shape: ONE map-side-combined groupBy on the bucket id
    computing 2·k min/max + k null-count aggregates over ONE scan; the
    long form is an explode of a struct array built ON the |buckets|-row
    aggregate (a union of per-column projections would let Catalyst
    push column pruning through and split the job into k full scans —
    tested against in test_layout)."""
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nul_{c}"),
        ]
    wide = df.groupBy(b.alias("bucket")).agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__min_{c}").cast("string").alias("min_v"),
            F.col(f"__max_{c}").cast("string").alias("max_v"),
            F.col(f"__nul_{c}").alias("n_nulls"))
        for c in stat_cols
    ])
    return (wide
            .select("bucket", "n_rows", F.explode(entries).alias("e"))
            .select("bucket", F.col("e.column").alias("column"),
                    F.col("e.min_v").alias("min_v"),
                    F.col("e.max_v").alias("max_v"),
                    "n_rows", F.col("e.n_nulls").alias("n_nulls")))
