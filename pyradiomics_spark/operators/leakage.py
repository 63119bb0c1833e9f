"""Zero-temporal-leakage audit (SURVEY.md §4 item 3).

Structural guarantee: features at cut T read only rows with warc_ts ≤ T
(as-of direction='backward', past-only window frames). This module provides
the **audit aggregation** that proves it on a concrete output: every output
row's contributing-source max timestamp must be ≤ its cut timestamp.

Convention: temporal operators carry provenance by keeping the matched
source timestamp column (e.g. the as-of join keeps ``right_ts``). The audit
is then a single scan-side filter count — cheap enough to run inline as a
quality gate on every pipeline run.

Future-looking operators — ``bfill`` and ``asof_join(direction='forward')``
— are label/serving tools and MUST NOT feed feature cuts: by construction
this audit flags every row they attach (source_ts > cut_ts), so wiring one
into a cut pipeline fails the gate loudly rather than leaking silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def audit_cut(df: DataFrame, cut_ts_col: str, source_ts_cols) -> dict:
    """Count rows violating source_ts <= cut_ts for each provenance column.

    Returns {col: violation_count}; all zeros ⇔ leakage-free. Null source
    timestamps (no match found) are never violations.
    """
    cols = [source_ts_cols] if isinstance(source_ts_cols, str) else list(source_ts_cols)
    aggs = [
        F.sum(
            F.when(
                F.col(c).isNotNull() & (F.col(c) > F.col(cut_ts_col)), 1
            ).otherwise(0)
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c] or 0) for c in cols}


def assert_no_leakage(df: DataFrame, cut_ts_col: str, source_ts_cols) -> None:
    violations = audit_cut(df, cut_ts_col, source_ts_cols)
    bad = {c: n for c, n in violations.items() if n > 0}
    if bad:
        raise AssertionError(f"temporal leakage detected: {bad}")
