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
