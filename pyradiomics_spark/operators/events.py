"""Event-sequence analytics — ordered funnels and cohort retention, the
two classic event-table queries a reference user's downstream analysts
run against the engine's sessionized output.

Reference scope note: pyradiomics has no event layer; these extend the
engine's temporal family (sessionize/asof/windows) with ordered-sequence
semantics.

Both operators are pure relational: per-stage conditional-min aggregates
(funnel) and arithmetic week bucketing (cohort) — no windows over hot
users, no Python, and every chained aggregate/join keys on the SAME
entity column so a cluster run reuses one hash partitioning end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(col):
    return col.cast("timestamp").cast("double")


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: tuple,
) -> DataFrame:
    """Ordered funnel: per user, the timestamp of the first ``stages[0]``
    event, the first ``stages[1]`` event STRICTLY AFTER it, and so on —
    the order-sensitive definition (a purchase before the first view
    does not count), which a naive per-type min gets wrong. Returns one
    row per user present in ``df``: (user, ts_stage_1..n nullable,
    max_stage int).

    Scale shape: one conditional-min aggregate per stage, each keyed on
    the user column — k chained aggregates over one reusable hash
    partitioning, no ordered window over a hot user's whole history, no
    collect_list. Stage k's filter needs stage k-1's time, carried by an
    equi-join of the |users|-row aggregate (never corpus rows)."""
    if len(stages) < 1:
        raise ValueError("need at least one stage")
    ev = df.select(
        F.col(user_col).alias("__u"),
        _epoch(F.col(ts_col)).alias("__t"),
        F.col(type_col).alias("__e"))
    # ONE corpus shuffle up front: every later aggregate and join keys
    # on __u, so an explicit repartition lets Catalyst satisfy all their
    # distribution requirements from this single exchange instead of
    # re-shuffling the event table once per stage
    ev = ev.repartition(F.col("__u"))
    users = ev.select("__u").distinct()
    acc = users
    prev: str | None = None
    for i, stage in enumerate(stages, start=1):
        cur = f"ts_stage_{i}"
        if prev is None:
            agg = (ev.where(F.col("__e") == stage)
                   .groupBy("__u").agg(F.min("__t").alias(cur)))
            acc = acc.join(agg, "__u", "left")
        else:
            gated = (ev.join(acc.select("__u", prev), "__u")
                     .where((F.col("__e") == stage)
                            & F.col(prev).isNotNull()
                            & (F.col("__t") > F.col(prev))))
            agg = gated.groupBy("__u").agg(F.min("__t").alias(cur))
            acc = acc.join(agg, "__u", "left")
        prev = cur
    max_stage = F.lit(0)
    for i in range(1, len(stages) + 1):
        max_stage = F.when(
            F.col(f"ts_stage_{i}").isNotNull(), i).otherwise(max_stage)
    return acc.select(
        F.col("__u").alias(user_col),
        *[f"ts_stage_{i}" for i in range(1, len(stages) + 1)],
        max_stage.alias("max_stage"))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the fixed-width time
    bucket of their FIRST event (arithmetic epoch buckets, not calendar
    weeks — identical in every engine and timezone), counted distinct in
    every later bucket they act in. Output (cohort, bucket_offset,
    n_users) — the (0, n) diagonal is cohort size.

    Scale shape: one min-aggregate per user (the cohort assignment —
    |users| rows), an equi-join back on the user key, and ONE distinct
    aggregate on (cohort, offset, user) before the count — exact
    distinct via two map-side-combined aggregates, never
    countDistinct over a skewed cohort in one task."""
    if bucket_days < 1:
        raise ValueError("bucket_days must be >= 1")
    width = float(bucket_days * 86400)
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.floor(_epoch(F.col(ts_col)) / F.lit(width)).alias("__b"))
    # one corpus shuffle on the user key serves both the cohort
    # aggregate and the join back (ReusedExchange, as in funnel)
    ev = ev.repartition(F.col("__u"))
    first = ev.groupBy("__u").agg(F.min("__b").alias("__cohort"))
    acts = (ev.join(first, "__u")
            .select("__u", "__cohort",
                    (F.col("__b") - F.col("__cohort")).alias("__off"))
            .distinct())
    return (acts.groupBy("__cohort", "__off")
            .agg(F.count("*").alias("n_users"))
            .select(F.col("__cohort").alias("cohort"),
                    F.col("__off").alias("bucket_offset"),
                    "n_users"))
