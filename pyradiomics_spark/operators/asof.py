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
    then keep left rows. One shuffle for the window partitioning (plus one
    map-side-combined exchange for the deterministic tie dedupe, skippable
    via ``deterministic_ties=False``), whole-stage codegen, no Python.
    Tie discipline: right rows sort BEFORE left rows at equal ts when
    ``allow_exact_matches`` (tag 0 < 1), AFTER otherwise (tag 2 > 1);
    right rows tying on (key, ts) collapse to the max payload tuple
    (``_dedupe_right_ties``), identically in both strategies.

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


def fill_cols_of(right_payload: list, right_ts: str) -> list:
    return [f"__r_{c}" for c in right_payload] + [f"__r_{right_ts}"]


def _orderable(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _dedupe_right_ties(right: DataFrame, keys: list, right_ts: str,
                       right_payload: list) -> DataFrame:
    """Deterministic tie discipline shared by BOTH physical strategies:
    among right rows with identical (key, ts), keep the MAX payload tuple
    (lexicographic max(struct), map-side combinable — duplicates collapse
    before the shuffle, so the extra exchange carries ≈ the distinct rows).

    Why not a tie-break sort key instead: a per-row hash/struct of a wide
    payload inside the window plan sends Catalyst's constraint propagation
    super-linear (measured: 5×–OOM on a 100-column feature payload); a
    pre-aggregation keeps every downstream expression narrow.

    Payloads with non-orderable columns (maps) keep Spark's arrival order
    for exact-duplicate timestamps — documented, not silently wrong: the
    ambiguity then only exists between rows that tie on (key, ts).
    """
    if not right_payload:
        return right.dropDuplicates(keys + [right_ts])
    if not all(_orderable(right.schema[c].dataType) for c in right_payload):
        import warnings
        bad = [c for c in right_payload
               if not _orderable(right.schema[c].dataType)]
        warnings.warn(
            "asof_join: deterministic_ties skipped — non-orderable payload "
            f"column(s) {bad}; rows tying on (key, ts) resolve in arrival "
            "order. Drop/serialize the map column(s) or pass "
            "deterministic_ties=False to silence.",
            RuntimeWarning, stacklevel=3)
        return right
    agg = right.groupBy(*keys, right_ts).agg(
        F.max(F.struct(*[F.col(c) for c in right_payload])).alias("__p"))
    return agg.select(
        *keys, right_ts, *[F.col("__p")[c].alias(c) for c in right_payload])


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
    deterministic_ties: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join, pure DataFrame ops (no Python UDF).

    ``direction``: 'backward' (default — latest right row with
    right_ts <= ts), 'forward' (earliest right row with right_ts >= ts;
    same single window pass, future-looking frame + first() fill — the
    bfill of joins, NOT leakage-safe for feature cuts and documented as
    such in operators.leakage), or 'nearest' (closer of the two by
    absolute gap, ties → backward, matching pandas merge_asof; BOTH fills
    come from one sorted window — still a single shuffle — and like
    'forward' it looks into the future, so it is not leakage-safe).

    ``deterministic_ties`` (default True) collapses right rows that share an
    exact (key, ts) to the max payload tuple before the join — run-stable
    output at the cost of one extra map-side-combined exchange. Disable for
    inputs known tie-free (e.g. ts is part of a unique key upstream)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    if direction == "nearest" and not allow_exact_matches:
        # with one union tag a right row at equal ts can sit in the past
        # frame or the future frame but not be EXCLUDED from both, so the
        # single-pass form can't express nearest-without-exact; nobody has
        # asked for it (pandas defaults to exact too) — fail loudly rather
        # than silently approximate
        raise ValueError(
            "direction='nearest' requires allow_exact_matches=True")
    keys = _as_list(on)
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    if deterministic_ties:
        right = _dedupe_right_ties(right, keys, right_ts, right_payload)

    if direction in ("backward", "nearest"):
        # right rows at equal ts must sort BEFORE the left row to be in the
        # past-only frame when exact matches are allowed (for nearest the
        # backward fill then catches exact rows at gap 0, which always
        # wins the distance comparison)
        right_tag = 0 if allow_exact_matches else 2
    else:
        # forward: frame is [current, ∞) — right rows at equal ts must sort
        # AFTER the left row to be included when exact matches are allowed
        right_tag = 2 if allow_exact_matches else 0

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
    fill_cols = fill_cols_of(right_payload, right_ts)
    # Ties among right rows are already resolved by _dedupe_right_ties, so
    # (ts, tag) is a TOTAL order over rows that can influence a fill.
    base = Window.partitionBy(*keys).orderBy(_TS, _TAG)
    bw = base.rowsBetween(Window.unboundedPreceding, 0)
    fw = base.rowsBetween(0, Window.unboundedFollowing)
    # ONE select for every fill (not a withColumn chain): N chained window
    # projections make Catalyst re-derive constraints N times over a
    # growing alias set — quadratic plan time on wide payloads.
    if direction == "nearest":
        # BOTH fills over the SAME sorted window — one shuffle, two
        # frames; pick the nearer side per row, ties → backward (pandas
        # merge_asof nearest tie semantics, pinned by the parity test)
        filled = unioned.select(
            *keys, _TS, _TAG, *left_payload,
            *[F.last(c, ignorenulls=True).over(bw).alias(f"__b_{c}")
              for c in fill_cols],
            *[F.first(c, ignorenulls=True).over(fw).alias(f"__f_{c}")
              for c in fill_cols],
        )
        b_ts = F.col(f"__b___r_{right_ts}")
        f_ts = F.col(f"__f___r_{right_ts}")
        # TIMESTAMP_NTZ refuses a direct double cast — hop through
        # timestamp (a no-op for tz-aware/numeric ts columns)
        as_num = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
        gap_b = as_num(F.col(_TS)) - as_num(b_ts)
        gap_f = as_num(f_ts) - as_num(F.col(_TS))
        take_f = f_ts.isNotNull() & (b_ts.isNull() | (gap_f < gap_b))
        filled = filled.select(
            *keys, _TS, _TAG, *left_payload,
            *[F.when(take_f, F.col(f"__f_{c}")).otherwise(F.col(f"__b_{c}"))
              .alias(c) for c in fill_cols],
        )
    else:
        if direction == "backward":
            w, fill = bw, (lambda c: F.last(c, ignorenulls=True))
        else:
            w, fill = fw, (lambda c: F.first(c, ignorenulls=True))
        filled = unioned.select(
            *keys, _TS, _TAG, *left_payload,
            *[fill(c).over(w).alias(c) for c in fill_cols],
        )

    out = filled.where(F.col(_TAG) == 1)

    if tolerance_seconds is not None:
        gap = F.col(_TS).cast("double") - F.col(f"__r_{right_ts}").cast("double")
        if direction == "forward":
            gap = -gap
        elif direction == "nearest":
            gap = F.abs(gap)
        in_tol = gap <= tolerance_seconds
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
    deterministic_ties: bool = True,
) -> DataFrame:
    """Cogrouped sort-merge as-of join (pandas.merge_asof kernel)."""
    import pandas as pd

    keys = _as_list(on)
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    if deterministic_ties:
        # same deterministic tie discipline as the window strategy: collapse
        # (key, ts) duplicates to the max payload tuple BEFORE the cogroup
        right = _dedupe_right_ties(right, keys, right_ts, right_payload)
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
        # (key, ts) is unique after _dedupe_right_ties — merge_asof's
        # "last row at equal ts" is therefore unambiguous
        r_sorted = (
            r_pdf[keys + [right_ts] + right_payload]
            .sort_values(right_ts, kind="mergesort")
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
