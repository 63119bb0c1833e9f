"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 "Stateful ops"): running per-entity feature state that
survives across micro-batches.

``running_entity_stats`` maintains (count, sum, sum-of-squares, last_ts)
per entity and emits the updated running mean/std each batch — the
streaming analog of incremental first-order features. The same reducer
works in batch mode via a plain groupBy for parity testing.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "cnt long, total double, total_sq double"
OUTPUT_SCHEMA = (
    "entity string, cnt long, mean double, m2 double"
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cnt, total, total_sq = state.get
    else:
        cnt, total, total_sq = 0, 0.0, 0.0
    for pdf in pdfs:
        v = pdf["value"].astype(float)
        cnt += int(v.size)
        total += float(v.sum())
        total_sq += float((v * v).sum())
    state.update((cnt, total, total_sq))
    mean = total / cnt if cnt else float("nan")
    m2 = total_sq / cnt - mean * mean if cnt else float("nan")
    yield pd.DataFrame(
        {"entity": [key[0]], "cnt": [cnt], "mean": [mean], "m2": [m2]})


def running_entity_stats(
    stream: DataFrame, entity_col: str = "ent", value_col: str = "value"
) -> DataFrame:
    """Streaming: running count/mean/second-moment per entity, state kept
    across micro-batches."""
    src = stream.selectExpr(f"{entity_col} as ent", f"{value_col} as value")
    return src.groupBy("ent").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_entity_stats(df: DataFrame, entity_col: str = "ent", value_col: str = "value") -> DataFrame:
    """Batch twin of the stateful reducer (parity oracle for tests)."""
    from pyspark.sql import functions as F

    return df.groupBy(F.col(entity_col).alias("entity")).agg(
        F.count(value_col).alias("cnt"),
        F.avg(value_col).alias("mean"),
        F.var_pop(value_col).alias("m2"),
    )


# ---------------------------------------------------------------------------
# streaming SCD2 history compression
# ---------------------------------------------------------------------------

SCD2_STATE_SCHEMA = "attr string, attr_null boolean, start_us long, n long"
SCD2_OUTPUT_SCHEMA = (
    "ent long, attr string, valid_from timestamp, valid_to timestamp, "
    "n_events long, is_current boolean"
)


def _scd2_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-entity run compression with the OPEN run carried in state.

    Each batch: merge the carried run with the batch's (ts, tie)-sorted
    events, emit every run that CLOSED (a different attribute arrived)
    with its half-open [valid_from, valid_to), and re-emit the still-open
    run as is_current=True — downstream keeps the LATEST row per
    (entity, valid_from), so a run that later closes simply supersedes
    its open emission (update-mode semantics). The walk is per-group
    Python over Arrow batches — inherent to custom stateful operators;
    the GROUPING is the parallelism, as with running_entity_stats."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "tie"], kind="mergesort")
    if state.exists:
        s_attr, s_null, s_start_us, s_n = state.get
        cur = [None if s_null else s_attr,
               pd.Timestamp(int(s_start_us) * 1000), int(s_n)]
    else:
        cur = None
    closed = []
    for ts, a in zip(batch["ts"], batch["attr"]):
        if a is not None and not isinstance(a, str) and pd.isna(a):
            a = None
        if cur is not None and ts < cur[1]:
            # ordering contract: per-entity event time must be
            # non-decreasing ACROSS batches (per-key-ordered log, e.g. a
            # keyed queue or watermarked upstream). A regression would
            # silently rewrite history — fail the query loudly instead;
            # genuinely late data belongs to the batch recompute path
            # (sources.sinks.recompute_affected_partitions).
            raise ValueError(
                f"stream_scd2: out-of-order event for entity {key[0]!r}: "
                f"{ts} < open-run start {cur[1]} — late data must go "
                "through the batch recompute path")
        if cur is None:
            cur = [a, ts, 1]
        elif (a is None and cur[0] is None) or (
                cur[0] is not None and a == cur[0]):
            cur[2] += 1
        else:
            closed.append((cur[0], cur[1], ts, cur[2], False))
            cur = [a, ts, 1]
    rows = list(closed)
    if cur is not None:
        rows.append((cur[0], cur[1], pd.NaT, cur[2], True))
        state.update((cur[0], cur[0] is None,
                      int(pd.Timestamp(cur[1]).value // 1000), int(cur[2])))
    yield pd.DataFrame({
        "ent": [key[0]] * len(rows),
        "attr": [r[0] for r in rows],
        "valid_from": [r[1] for r in rows],
        "valid_to": [r[2] for r in rows],
        "n_events": [r[3] for r in rows],
        "is_current": [r[4] for r in rows],
    })


def stream_scd2(
    stream: DataFrame,
    entity_col: str,
    ts_col: str,
    attr_col: str,
    tie_col: str,
) -> DataFrame:
    """STREAMING SCD2 compression (the incremental twin of
    operators.windows.scd2_compress): per-entity attribute runs
    maintained across micro-batches via applyInPandasWithState — closed
    intervals emit once, the open run re-emits each batch as
    is_current=True (latest (entity, valid_from) wins downstream). On a
    single-batch replay the output equals the batch operator exactly
    (pinned in tests and the driver gate)."""
    src = stream.selectExpr(
        f"{entity_col} as ent", f"{ts_col} as ts",
        f"{attr_col} as attr", f"{tie_col} as tie")
    return src.groupBy("ent").applyInPandasWithState(
        _scd2_update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RATE_STATE_SCHEMA = "win array<long>, cnt array<long>"
RATE_OUTPUT_SCHEMA = (
    "key long, ts timestamp, tie long, allowed boolean"
)


def _rate_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key windowed-quota admission: the first ``limit`` events in
    each tumbling window pass, the rest are flagged. State is the
    per-window counts map (two parallel arrays — fixed-type state),
    pruned to windows ≥ the newest seen minus one (the same
    no-late-data ordering contract as _scd2_update; a genuinely late
    event fails loudly rather than silently resetting a quota)."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "tie"], kind="mergesort")
    limit = int(batch["limit"].iloc[0])
    width_us = int(batch["width_us"].iloc[0])
    counts: dict = {}
    if state.exists:
        wins, cnts = state.get
        counts = dict(zip(wins, cnts))
    max_win = max(counts) if counts else None
    allowed = []
    for ts in batch["ts"]:
        w = int(pd.Timestamp(ts).value // 1000) // width_us
        if max_win is not None and w < max_win - 1:
            raise ValueError(
                f"stream_rate_limit: event for key {key[0]!r} in window "
                f"{w} arrived after window {max_win} — late data must "
                "go through the batch recompute path")
        c = counts.get(w, 0)
        allowed.append(c < limit)
        counts[w] = c + 1
        max_win = w if max_win is None else max(max_win, w)
    # prune closed windows: only the newest two can still receive rows
    counts = {w: c for w, c in counts.items() if w >= max_win - 1}
    state.update((list(counts.keys()), list(counts.values())))
    yield pd.DataFrame({
        "key": [key[0]] * len(batch),
        "ts": batch["ts"].tolist(),
        "tie": batch["tie"].tolist(),
        "allowed": allowed,
    })


def stream_rate_limit(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    limit: int,
    window_seconds: int = 3600,
) -> DataFrame:
    """STREAMING per-key rate limiter (crawl/ingest admission control):
    within each ``window_seconds`` tumbling window, the first ``limit``
    events of a key pass (``allowed=true``), the overflow is flagged —
    politeness quotas per host, API budget enforcement, bot throttling.
    Quota state (per-window counts, pruned to the two live windows)
    survives across micro-batches via applyInPandasWithState; on a
    single-batch replay the decisions equal the batch twin
    ``row_number() over (key, window order ts, tie) <= limit`` exactly
    (pinned in tests and the driver gate). Ordering contract across
    batches as stream_scd2: per-key event time non-decreasing up to one
    window of slack; later arrivals fail loudly."""
    if limit < 1 or window_seconds < 1:
        raise ValueError("limit and window_seconds must be >= 1")
    src = stream.selectExpr(
        f"{key_col} as key", f"{ts_col} as ts", f"{tie_col} as tie"
    ).withColumn("limit", F.lit(int(limit))).withColumn(
        "width_us", F.lit(int(window_seconds) * 1_000_000))
    return src.groupBy("key").applyInPandasWithState(
        _rate_update,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTR_STATE_SCHEMA = (
    "ft string, lt string, has_ft boolean, last_us long"
)
ATTR_OUTPUT_SCHEMA = (
    "key long, tie long, first_touch string, last_touch string"
)


def _attr_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Live credit assignment: carry the user's first and most recent
    non-conversion event type in state; each conversion emits its
    (first_touch, last_touch) pair at arrival time. Ordering contract
    across batches as the other stateful ops (non-decreasing per-key
    event time; violations raise)."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "tie"], kind="mergesort")
    conv = batch["conv_type"].iloc[0]
    ft, lt, has_ft, last_us = (None, None, False, None)
    if state.exists:
        ft, lt, has_ft, last_us = state.get
        if not has_ft:
            ft = None
        if lt is not None and not isinstance(lt, str):
            lt = None
    out = []
    for ts, tie, et in zip(batch["ts"], batch["tie"],
                           batch["event_type"]):
        us = int(pd.Timestamp(ts).value // 1000)
        if last_us is not None and us < int(last_us):
            raise ValueError(
                f"stream_attribution: out-of-order event for key "
                f"{key[0]!r} — late data must go through the batch "
                "recompute path")
        last_us = us
        if et == conv:
            out.append((int(tie), ft, lt))
        else:
            if not has_ft:
                ft, has_ft = et, True
            lt = et
    state.update((ft, lt, bool(has_ft), int(last_us)))
    yield pd.DataFrame({
        "key": [key[0]] * len(out),
        "tie": [t for t, _, _ in out],
        "first_touch": [f for _, f, _ in out],
        "last_touch": [l for _, _, l in out],
    })


def stream_attribution(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tie_col: str,
    conversion_type: str,
) -> DataFrame:
    """STREAMING first/last-touch attribution (the incremental twin of
    operators.events.conversion_attribution): each conversion event
    emits the crediting channels AT ARRIVAL, with the user's running
    bookends carried across micro-batches in state — the serve-time
    credit feed batch attribution can only produce after the fact. On a
    single-batch replay the emitted pairs equal the batch operator's
    per-conversion bookends exactly (pinned in tests and the gate)."""
    src = stream.selectExpr(
        f"{key_col} as key", f"{ts_col} as ts",
        f"{type_col} as event_type", f"{tie_col} as tie"
    ).withColumn("conv_type", F.lit(conversion_type))
    return src.groupBy("key").applyInPandasWithState(
        _attr_update,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
