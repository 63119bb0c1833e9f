"""Interval (range-containment) join — match point events to the time
intervals that contain them, the temporal-feature primitive behind
campaign/experiment attribution, maintenance-window exclusion, and
label-window joins ("every page fetched while host h was flagged").

Reference scope note: pyradiomics has no temporal layer; this operator
extends the engine's point-in-time family (operators/asof.py) from
nearest-key semantics to containment semantics.

Spark has no native range-join operator: the naive plan for
``start <= ts AND ts < end`` is a BroadcastNestedLoopJoin (O(n·m) row
comparisons — dead at 10 TB of events). This module uses the published
binned range-join strategy (the same plan the Databricks range-join hint
and spatial engines' grid joins produce): quantize time into
``bucket_width``-second bins, explode each interval over every bin it
overlaps, equi-join facts to intervals on (bin [+ user keys]), then apply
the exact containment predicate. Each fact lands in EXACTLY one bin and an
interval appears at most once per bin, so the equi-join introduces no
duplicate matches — the residual filter only removes false candidates.

Scale shape: ONE hash-shuffle per side keyed on the bin (plus any equi
keys) — co-partitionable and AQE-skew-splittable; the interval side grows
by ceil(len/bucket_width)+1 rows per interval, so pick ``bucket_width``
near the MEDIAN interval length (amplification ≤ ~2×). A pathological
months-long interval amplifies linearly — cap it upstream or raise
``max_bins_per_interval`` consciously.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__iv_bin"


def _epoch(col: Column) -> Column:
    """Seconds-since-epoch double; accepts timestamp/NTZ or numeric."""
    return col.cast("timestamp").cast("double")


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    by: tuple[str, ...] = (),
    how: str = "inner",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Join each fact row to every interval row with
    ``start <= ts < end`` (half-open, the watermark-friendly convention —
    adjacent intervals never double-claim a boundary event), optionally
    also equi-matching on ``by`` columns (e.g. user_id). Facts matching k
    intervals appear k times; ``how='left_outer'`` keeps unmatched facts
    with null interval columns. Interval columns are carried through;
    colliding names must be renamed upstream (fails loudly on ambiguity
    rather than silently preferring a side).

    ``bucket_width`` is in seconds. ``max_bins_per_interval`` fails fast
    on a quantization that would explode a single interval into more
    than that many join rows (a plan-time constant, checked per-row at
    run time) — the symptom of a bucket_width far below interval length.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = float(bucket_width)

    overlap = set(facts.columns) & set(intervals.columns) - set(by)
    if overlap:
        raise ValueError(
            f"ambiguous columns on both sides: {sorted(overlap)}; "
            "rename before joining")

    f_binned = facts.withColumn(
        _BIN, F.floor(_epoch(F.col(ts_col)) / F.lit(w)).cast("long"))

    s, e = _epoch(F.col(start_col)), _epoch(F.col(end_col))
    lo = F.floor(s / F.lit(w)).cast("long")
    hi = F.floor(e / F.lit(w)).cast("long")  # end exclusive: boundary bin
    # is a harmless false candidate removed by the residual predicate
    n_bins = hi - lo + 1
    guarded = intervals.withColumn(
        "__iv_nbins", n_bins).withColumn(
        _BIN,
        F.explode(F.when(
            F.col("__iv_nbins") <= max_bins_per_interval,
            F.sequence(lo, hi)).otherwise(
            F.raise_error(F.concat(
                F.lit("interval spans too many bins ("),
                F.col("__iv_nbins").cast("string"),
                F.lit(f" > {max_bins_per_interval}); raise bucket_width "
                      "or cap interval length"))))),
    ).drop("__iv_nbins")

    cond = [f_binned[_BIN] == guarded[_BIN]]
    for k in by:
        cond.append(f_binned[k] == guarded[k])
    ts_e = _epoch(f_binned[ts_col])
    cond.append(_epoch(guarded[start_col]) <= ts_e)
    cond.append(ts_e < _epoch(guarded[end_col]))

    iv_cols = [c for c in intervals.columns if c not in by]
    joined = f_binned.join(guarded, cond, how).select(
        *[f_binned[c] for c in facts.columns],
        *[guarded[c] for c in iv_cols])
    return joined
