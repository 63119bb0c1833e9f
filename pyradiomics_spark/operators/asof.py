"""Point-in-time (as-of) join — the engine's core temporal operator
(north_rule; SURVEY.md §2.3 row "As-of join").

For each left row (entity, ts) attach the latest right row with
right_ts <= ts (direction='backward'), never a future row — zero temporal
leakage by construction.

Two physical strategies, same semantics:

``asof_join``(default) — **union + window**, 100% JVM-side:
    tag and union both sides on a common schema, then one window
    ``last(col, ignoreNulls) over (partition by key order by ts, tag
    rows unbounded preceding .. current row)`` per right payload column,
    then keep left rows. One shuffle (the window partitioning), whole-stage
    codegen, no Python. Tie discipline: right rows sort BEFORE left rows at
    equal ts when ``allow_exact_matches`` (tag 0 < 1), AFTER otherwise
    (tag 2 > 1).

``asof_join_merge`` — **cogroup + pandas.merge_asof**: sort-merge kernel per
    key group (Arrow boundary), matching the reference-era design of
    secondary-sorted salted range partitions. Useful when the right payload
    is very wide (one window-last per column would bloat the JVM plan).

Skew: both forms shuffle by the entity key; hot hosts are handled by AQE
skew handling plus the explicit ``salt_hot_keys`` helper in
``operators.salting`` (pre-splits the left side; right side is replicated
per salt bucket — valid because the right timeline is needed in full in
every bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_TS = "__asof_ts"


def _as_list(x) -> list:
    return [x] if isinstance(x, str) else list(x)


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    allow_exact_matches: bool = True,
    avg_group_rows: int | None = None,
) -> DataFrame:
    """Physical-strategy dispatch. Measured head-to-head (BENCH context):
    the union+window form wins across payload widths up to ~100 columns —
    one window pass, whole-stage codegen, no per-group Python overhead. The
    cogrouped merge_asof kernel only wins when per-key groups are LARGE
    (≥ ~10k rows/key), where one Arrow pass beats many window fills; with
    small groups its per-group pandas overhead (~10 ms × n_keys) dominates.
    Callers that know their group sizes pass ``avg_group_rows``."""
    if avg_group_rows is not None and avg_group_rows >= 10_000:
        return asof_join_merge(left, right, on, left_ts, right_ts,
                               allow_exact_matches)
    return asof_join(left, right, on, left_ts, right_ts, allow_exact_matches)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of left join, pure DataFrame ops (no Python UDF)."""
    keys = _as_list(on)
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]

    right_tag = 0 if allow_exact_matches else 2

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"__r_{right_ts}"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(right_tag).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.col(right_ts).alias(f"__r_{right_ts}"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # Deterministic tie-break among right rows sharing (key, ts): order by
    # the right payload columns too, so the attached row is the MAX payload
    # tuple — stable across runs/partitionings and identical to the rule
    # asof_join_merge applies (it sorts its right side the same way).
    # Left rows carry nulls in these columns; their relative order at equal
    # ts is irrelevant (each left row is its own output row).
    tie_cols = [F.col(f"__r_{c}") for c in right_payload]
    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _TAG, *tie_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    fill_cols = [f"__r_{c}" for c in right_payload] + [f"__r_{right_ts}"]
    for c in fill_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.where(F.col(_TAG) == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.col(_TS).cast("double") - F.col(f"__r_{right_ts}").cast("double")
        ) <= tolerance_seconds
        out = out.select(
            *keys, _TS, *left_payload,
            *[F.when(in_tol, F.col(f"__r_{c}")).alias(f"__r_{c}") for c in right_payload],
            F.when(in_tol, F.col(f"__r_{right_ts}")).alias(f"__r_{right_ts}"),
        )

    renames = {f"__r_{c}": c for c in right_payload}
    renames[f"__r_{right_ts}"] = right_ts
    out = out.select(
        *keys,
        F.col(_TS).alias(left_ts),
        *left_payload,
        *[F.col(old).alias(new) for old, new in renames.items()],
    )
    return out


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    allow_exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """Cogrouped sort-merge as-of join (pandas.merge_asof kernel)."""
    import pandas as pd

    keys = _as_list(on)
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    out_fields = []
    for f in left.schema.fields:
        out_fields.append(f"`{f.name}` {f.dataType.simpleString()}")
    for c in [right_ts] + right_payload:
        out_fields.append(f"`{c}` {right.schema[c].dataType.simpleString()}")
    schema = ", ".join(out_fields)
    left_cols = list(left.columns)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(left_ts, kind="mergesort")
        if r_pdf.empty:
            out = l_sorted.copy()
            out[right_ts] = pd.NaT
            for c in right_payload:
                out[c] = None
            return out[left_cols + [right_ts] + right_payload]
        # sort ties by payload too (ascending, NaN first) so merge_asof's
        # "last row at equal ts" is the MAX payload tuple — the same
        # deterministic tie-break as the window strategy above
        r_sorted = (
            r_pdf[keys + [right_ts] + right_payload]
            .sort_values([right_ts] + right_payload, kind="mergesort",
                         na_position="first")
            .rename(columns={right_ts: "__rts"})
        )
        merged = pd.merge_asof(
            l_sorted,
            r_sorted.drop(columns=keys),
            left_on=left_ts,
            right_on="__rts",
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        merged = merged.rename(columns={"__rts": right_ts})
        return merged[left_cols + [right_ts] + right_payload]

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, schema=schema)
    )
